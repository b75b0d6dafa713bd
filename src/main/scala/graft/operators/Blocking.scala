package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Bounded pair generation for near-dup / similarity pipelines.
  *
  * The naive shape — all pairs within a blocking key — is quadratic in the
  * hottest block: one degenerate key (a boilerplate label, a mass-duplicate
  * signature) turns a 100 TB run into an O(block²) shuffle. Both generators
  * here keep the exact semantics while the blocks are small and switch to a
  * bounded strategy only past an explicit cap, ALWAYS logging the routing
  * decision (no silent truncation — reference-grade pipelines must be able
  * to account for every dropped candidate).
  */
object Blocking {

  /** Exact all-pairs cosine scoring within `label` blocks, scale-guarded:
    * blocks whose row count exceeds `maxBlock` are sub-partitioned by a
    * deterministic random-hyperplane LSH bucket over `embedding`
    * ([[VectorFunctions.lshBucket]]) and pairs are generated only within
    * (label, bucket) — cost drops from O(block²) to O(Σ sub-bucket²) at a
    * bounded recall loss (cosine-similar vectors agree on sign bits with
    * high probability). Blocks at or under the cap keep bucket 0, so the
    * result is EXACTLY the unbounded one until the cap bites.
    *
    * Input frame must carry `vec_id, label, embedding, nrm` (norm
    * precomputed once per vector); output is `(a_id, b_id, cosine)` with
    * cosine rounded to 6 places. The per-label size frame is O(#labels) and
    * joins back via AQE's broadcast decision; only the OVERSIZED labels are
    * collected for the log line (O(#hot labels), tiny by construction).
    */
  def boundedCosinePairs(e: DataFrame, maxBlock: Long = 10000,
                         lshBits: Int = 4, dims: Int = 64): DataFrame = {
    val sizes = e.groupBy(col("label")).agg(count(lit(1)).as("_blk"))
    val over = sizes.filter(col("_blk") > maxBlock).collect()
    if (over.nonEmpty)
      System.err.println(s"[blocking] ${over.length} label block(s) over " +
        s"$maxBlock rows routed through $lshBits-bit LSH sub-buckets: " +
        over.map(r => s"${r.get(0)}=${r.get(1)}").mkString(", "))
    val withBucket = e.join(sizes, "label")
      .withColumn("_bkt",
        when(col("_blk") > maxBlock,
          VectorFunctions.lshBucket(col("embedding"), lshBits, dims))
        .otherwise(lit(0L)))
    withBucket.as("a").join(withBucket.as("b"),
        col("a.label") === col("b.label") && col("a._bkt") === col("b._bkt") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(VectorFunctions.cosineWithNorms(
          VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")), 6).as("cosine"))
  }

  /** Candidate pairs from MinHash band buckets, degenerate-bucket capped:
    * a bucket holding more than `maxBucket` members (mass duplicates, or
    * many near-empty documents sharing a signature) would make the
    * self-join quadratic in that bucket; such buckets are dropped from
    * candidate generation with a logged member count. Standard LSH buckets
    * pass through untouched, so results are exact until the cap bites.
    *
    * Input frame: `(doc_id, band)`; output: distinct `(a_id, b_id)` with
    * a_id < b_id.
    */
  def cappedBandCandidates(bands: DataFrame, maxBucket: Long = 1000): DataFrame = {
    val sizes = bands.groupBy(col("band")).agg(count(lit(1)).as("_bsz"))
    val dropped = sizes.filter(col("_bsz") > maxBucket).collect()
    if (dropped.nonEmpty)
      System.err.println(s"[minhash-lsh] dropped ${dropped.length} band " +
        s"bucket(s) over $maxBucket members from candidate generation: " +
        dropped.map(r => s"${r.get(0)}=${r.get(1)}").mkString(", "))
    val kept = bands.join(sizes.filter(col("_bsz") <= maxBucket).select("band"), "band")
    kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }
}
