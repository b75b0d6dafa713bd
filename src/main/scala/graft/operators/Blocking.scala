package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.functions.VectorFunctions

/** Bounded pair generation for near-dup / similarity pipelines.
  *
  * The naive shape — all pairs within a blocking key — is quadratic in the
  * hottest block: one degenerate key (a boilerplate label, a mass-duplicate
  * signature) turns a 100 TB run into an O(block²) shuffle. Both generators
  * here keep the exact semantics while the blocks are small and switch to a
  * bounded strategy only past an explicit cap.
  *
  * Shape: group sizes come from a partial+final AGGREGATE over the
  * blocking key, joined back onto the rows — NOT a window count. A window
  * `count().over(partitionBy(key))` buffers each group on one task, so the
  * very skew these caps exist for (one hot label/bucket) would concentrate
  * the whole hot group on a single straggler task *before* the bounded
  * path could split it — and a constant-foldable key (`lit("hot")`) is
  * folded out of a window spec entirely, collapsing to ONE partition. The
  * aggregate form ships only (key, count) rows; the two self-join sides
  * remain identical subtrees so their exchange is computed once and
  * reused.
  *
  * Cap accounting is NOT silent and costs no extra pass: `observe()`
  * metrics ride the same window frame and a per-session
  * [[QueryExecutionListener]] logs them whenever a cap actually bit.
  * No driver-side pre-count of the input — at 100 TB that would double
  * the scan.
  */
object Blocking {

  private[operators] val BlockCapMetric = "graft_block_cap"
  private[operators] val BandCapMetric = "graft_band_cap"
  private[operators] val PostingCapMetric = "graft_posting_cap"
  private[operators] val GroupCapMetric = "graft_group_cap"

  // weakly-keyed: a per-query cloned session (spark.newSession pattern)
  // must stay GC-able — a strong static set would pin every session and
  // its registered listener forever
  private val installedSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotent per-session listener: surfaces the observe() cap metrics on
    * every successful action over a plan that contains them. (Under a
    * self-join without exchange reuse the member-row counter can be
    * evaluated per branch and overstate; it is a did-the-cap-bite signal,
    * not an exact audit count.) */
  private[operators] def ensureCapListener(spark: SparkSession): Unit =
    if (installedSessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def report(qe: QueryExecution, metric: String, what: String): Unit =
          qe.observedMetrics.get(metric).foreach { row =>
            val rows = row.getAs[Long]("capped_rows")
            if (rows > 0)
              System.err.println(s"[blocking] $rows member row(s) in " +
                s"groups over the cap $what (largest group " +
                s"${row.getAs[Long]("max_group")})")
          }
        override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit = {
          report(qe, BlockCapMetric, "routed through LSH sub-buckets")
          report(qe, BandCapMetric, "star-compressed in band candidates")
          report(qe, GroupCapMetric,
            "in identical-signature groups star-compressed before banding")
          report(qe, PostingCapMetric,
            "in stop-shingle postings excluded from candidate generation")
        }
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
      })
    }

  private def capMetrics(sizeCol: String, cap: Long) = Seq(
    sum(when(col(sizeCol) > cap, 1L).otherwise(0L)).as("capped_rows"),
    coalesce(max(col(sizeCol)), lit(0L)).as("max_group"))

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
    * cosine rounded to 6 places.
    */
  def boundedCosinePairs(e: DataFrame, maxBlock: Long = 10000,
                         lshBits: Int = 4, dims: Int = 64): DataFrame = {
    ensureCapListener(e.sparkSession)
    val m = capMetrics("_blk", maxBlock)
    // label cardinality is usually O(#labels) — tiny — so the size frame
    // broadcasts and the rows never shuffle just to be counted; but the
    // choice is left to AQE (no forced hint): a pathological label space
    // would otherwise be collected to the driver regardless of size
    val sizes = e.groupBy(col("label")).agg(count(lit(1)).as("_blk"))
    val sized = e
      .join(sizes, Seq("label"))
      .observe(BlockCapMetric, m.head, m.tail: _*)
      .withColumn("_bkt",
        when(col("_blk") > maxBlock,
          VectorFunctions.lshBucket(col("embedding"), lshBits, dims))
        .otherwise(lit(0L)))
    sized.as("a").join(sized.as("b"),
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
    * self-join quadratic in that bucket. Such buckets switch to STAR
    * compression — every member pairs with the bucket's hub (min doc_id),
    * O(n) edges instead of O(n²) — which preserves connected-components
    * connectivity, so mass-duplicated content still collapses into one
    * cluster instead of silently escaping. Pair-level recall inside a
    * starred bucket is reduced (only hub pairs are emitted for
    * verification); the switch is observed and logged. Standard buckets
    * are exact.
    *
    * CONTRACT for non-empty `carry` with a carry-determined verify
    * (simhash: hamming over the carried signatures): callers must
    * pre-collapse identical carry tuples to one representative BEFORE
    * banding — [[NearDup.simhashPairs]]'s identical-signature collapse —
    * so every bucket holds DISTINCT tuples. A hub-star edge between
    * distinct tuples that fails the verify then never splits a true
    * cluster: the caller's within-group edges supply the intra-group
    * connectivity, and cross-group connectivity is decided by tuples
    * alone, which star edges sample one representative pair of. (r17
    * guarded duplicate-tuple buckets inside this generator instead —
    * per-group representative machinery whose four extra aggregates/
    * joins measured ~2× on every dedup pipeline while being bit-identical
    * to hub-star on the distinct-tuple buckets that pre-collapsed callers
    * actually produce, so the guard moved to the source.)
    *
    * Input frame: `(doc_id, band, carry...)`; output: distinct `(a_id,
    * b_id, a_<carry>..., b_<carry>...)` with a_id < b_id.
    *
    * @param carry    input columns to ride along with each side of a pair
    *                 (e.g. the signature a hamming verify needs) — saves the
    *                 verify's join-back at the cost of widening the band
    *                 shuffle rows
    * @param preDedup filter applied to the raw (pre-distinct) pair stream.
    *                 Band candidates are mostly false positives, so a cheap
    *                 verify here means the dedup aggregate runs on the few
    *                 rows that pass, not the raw candidate set
    */
  def cappedBandCandidates(bands: DataFrame, maxBucket: Long = 1000,
                           carry: Seq[String] = Nil,
                           preDedup: DataFrame => DataFrame = identity): DataFrame = {
    ensureCapListener(bands.sparkSession)
    // Several consumers read `bands` (bucket stats, the exact path, the
    // over-cap paths), and upstream of it usually sits an expensive
    // signature aggregation — persist so that work runs once, not per
    // branch. Rows are compact (ids + band + carry scalars, ~1% of the
    // text they derive from). Lifecycle is session-managed like
    // [[NearDup.pairs]]' hash cache: long-lived sessions should
    // `spark.catalog.clearCache()` between corpora (this also covers the
    // derived frames the over-cap branch computes from `b`).
    val b = bands.persist()
    // Bucket sizing is a partial+final AGGREGATE, never a window: a window
    // over `band` would buffer each bucket on one task — the degenerate
    // hot bucket this cap exists for becoming the straggler — while the
    // aggregate ships only (band, count, hub) rows. hub = min by doc_id
    // WITH its carry columns: struct comparison orders by the leading id
    // field, so the min-aggregate is the hub row itself. The cap metrics
    // ride this (small) frame: capped_rows = member rows in over-cap
    // buckets.
    val m = Seq(
      sum(when(col("_bsz") > maxBucket, col("_bsz")).otherwise(0L)).as("capped_rows"),
      coalesce(max(col("_bsz")), lit(0L)).as("max_group"))
    val stats = b.groupBy(col("band")).agg(
        count(lit(1)).as("_bsz"),
        min(struct(col("doc_id") +: carry.map(col): _*)).as("_hub"))
      .observe(BandCapMetric, m.head, m.tail: _*)
    // over-cap buckets are O(#degenerate templates) — tiny by construction
    // (that degeneracy is what the cap detects), so BOTH joins against
    // them resolve as broadcasts under AQE: the exact path's anti-join
    // passes the band rows through WITHOUT shuffling them for sizing, and
    // the band shuffle happens exactly once, in the self-join below
    // (identical subtrees — the exchange is computed once and reused).
    val big = stats.filter(col("_bsz") > maxBucket)
    val small = b.join(big.select(col("band")), Seq("band"), "left_anti")
    val exact = small.as("a").join(small.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id") +: col("b.doc_id").as("b_id") +:
        (carry.map(c => col(s"a.$c").as(s"a_$c")) ++
         carry.map(c => col(s"b.$c").as(s"b_$c"))): _*)
    // star across the over-cap bucket: the hub came free with the stats
    // aggregate, so this is exactly one (broadcast) join over the member
    // rows — the shape every mass-duplicate bucket pays
    val starred = b.join(big.select(col("band"), col("_hub")), Seq("band"))
      .filter(col("doc_id") =!= col("_hub.doc_id"))
      .select(col("_hub.doc_id").as("a_id") +: col("doc_id").as("b_id") +:
        (carry.map(c => col(s"_hub.$c").as(s"a_$c")) ++
         carry.map(c => col(c).as(s"b_$c"))): _*)
    preDedup(exact.union(starred)).distinct()
  }
}
