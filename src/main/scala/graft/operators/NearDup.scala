package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, WordNgramHashes}

/** MinHash-LSH near-duplicate detection as a reusable operator — the
  * library form of the `dd_minhash_lsh` / `dd_dedup_corpus` queries.
  *
  * One-hash construction: each shingle is md5-hashed ONCE; the `slots`
  * signature positions are linear permutations (a_i·h + b_i) mod P folded
  * as min-aggregates over exploded (id, shingle-hash) rows — fully
  * codegen'd hash aggregation with map-side partials. Bands of the
  * signature bucket candidates ([[Blocking.cappedBandCandidates]] guards
  * the degenerate buckets), then exact Jaccard over the shingle-hash sets
  * verifies. Only (id, band) longs shuffle — signatures are
  * `8·slots` bytes per document regardless of document size, which is what
  * makes MinHash dedup feasible at 100 TB.
  */
object NearDup {

  /** Verified near-dup pairs `(a_id, b_id, jaccard)` with a_id < b_id.
    *
    * @param docs       frame with `idCol` (long) and `textCol` (string)
    * @param ngram      words per shingle
    * @param slots      minhash signature length
    * @param rowsPerBand slots/rowsPerBand bands — more bands = higher
    *                    candidate recall at lower precision
    * @param threshold  exact-Jaccard verification floor
    * @param maxBucket  degenerate band-bucket cap (logged, never silent)
    */
  def pairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            ngram: Int = 3, slots: Int = 32, rowsPerBand: Int = 4,
            threshold: Double = 0.2, maxBucket: Long = 1000): DataFrame = {
    require(slots % rowsPerBand == 0, "slots must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val perms = (0 until slots).map(TF.minhashPerm)
    val P = TF.MinhashP
    // the ONLY pass that touches text — tokenize+shingle+hash fused into
    // one native expression; persisted because three branches consume it
    // and the cache is hashes only, ~1% of corpus size. Cache lifecycle is
    // session-managed (LRU-evicted): callers invoking this repeatedly in a
    // long-lived session should spark.catalog.clearCache() between corpora.
    val hv = docs
      .select(col(idCol).as("doc_id"),
        explode(WordNgramHashes(col(textCol), ngram)).as("h60"))
      .select($"doc_id", ($"h60" % P).as("h"))
      .persist()
    // all slot minima in ONE compact aggregate (MinhashSigAgg): value-
    // identical to 32 separate min() columns but the plan stays small —
    // the 32-agg declarative form codegen'd a class whose one-time compile
    // dominated a cold run
    val sigArr = hv.groupBy($"doc_id")
      .agg(graft.functions.MinhashSigAgg($"h", perms, P).as("sig"))
    val bands = sigArr.select($"doc_id",
      explode(TF.minhashBands($"sig", rowsPerBand, slots / rowsPerBand)).as("band"))
    val cand = Blocking.cappedBandCandidates(bands, maxBucket)
    // Jaccard over the shingle-HASH sets — identical values to string
    // jaccard (same md5-derived hashes), far cheaper
    val sets = hv.groupBy($"doc_id").agg(collect_set($"h").as("hs"))
    cand
      .join(sets.select($"doc_id".as("a_id"), $"hs".as("sa")), "a_id")
      .join(sets.select($"doc_id".as("b_id"), $"hs".as("sb")), "b_id")
      .withColumn("jaccard", round(
        size(array_intersect($"sa", $"sb")).cast("double") /
        size(array_union($"sa", $"sb")), 6))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", $"jaccard")
  }

  /** SimHash signatures `(doc_id, sh)` as a codegen'd aggregation: tokens
    * explode to (id, hash) rows — each token md5-hashed ONCE — then one
    * hash aggregate folds `bits` per-bit set-counts (map-side partials) and
    * a final projection assembles the signature. Bit-identical to the
    * column-level [[TF.simhash]]`(`[[TF.tokens]]`)`, but ~10× faster: the
    * column form nests `bits` interpreted ArrayAggregates that each re-hash
    * the token array (higher-order functions are CodegenFallback, so
    * common-subexpression elimination never kicks in). */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", bits: Int = 60): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // explode_outer keeps empty/whitespace-only docs (null hash rows):
    // count(h)=0 → all-zero signature, matching the column form
    val hv = docs
      .select(col(idCol).as("doc_id"),
        explode_outer(TF.tokens(col(textCol))).as("t"))
      .select($"doc_id", TF.hash60($"t").as("h"))
    // one compact aggregate (SimhashAgg) instead of `bits` sum() columns:
    // same majority-vote values, but the plan (and its one-time codegen
    // compile on a cold run) stays constant-size in `bits`
    hv.groupBy($"doc_id")
      .agg(graft.functions.SimhashAgg($"h", bits).as("sh"))
  }

  /** SimHash near-dup pairs `(a_id, b_id, hamming)` with a_id < b_id via
    * banded blocking over a 60-bit signature.
    *
    * Pigeonhole exactness: a pair within hamming distance `hammingMax`
    * differs in at most `hammingMax` of the `nBands` bands, so with
    * `hammingMax < nBands` it must agree on at least one band and is never
    * missed. The defaults (4 bands × 15 bits = 131,072 distinct buckets)
    * keep bucket population ~n/32k per band — at 100× corpus the buckets
    * grow linearly but stay small, unlike an 8-bit band space (1,024
    * buckets total) where the band self-join goes quadratic. Degenerate
    * buckets (mass-identical signatures) are additionally guarded by
    * [[Blocking.cappedBandCandidates]] star compression, observed + logged.
    *
    * Signatures are computed in ONE pass: they flow into the band explode
    * with the 8-byte signature carried alongside each (doc_id, band) row
    * — [[Blocking.cappedBandCandidates]] persists that compact band frame
    * so its two consumers (bucket-stats aggregate, candidate join) don't
    * re-run the signature aggregation — and the hamming verify runs
    * BEFORE the candidate dedup (band candidates are mostly false
    * positives), so a join-back by id is never needed. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", bits: Int = 60, nBands: Int = 4,
                   hammingMax: Int = 3, maxBucket: Long = 1000): DataFrame = {
    require(bits % nBands == 0, "bits must divide into bands")
    require(hammingMax < nBands,
      "pigeonhole exactness needs hammingMax < nBands")
    val spark = docs.sparkSession
    import spark.implicits._
    val bandBits = bits / nBands
    val bandSpace = 1L << bandBits
    val sh = simhashSignatures(docs, idCol, textCol, bits)
    // band key ranges are disjoint per band index (b·2^bandBits + value)
    val bands = sh.select($"doc_id", $"sh",
      explode(array((0 until nBands).map(b =>
        shiftrightunsigned($"sh", bandBits * b)
          .bitwiseAND(lit(bandSpace - 1)) + lit(b * bandSpace)): _*)).as("band"))
    Blocking.cappedBandCandidates(bands, maxBucket, carry = Seq("sh"),
        preDedup = _.filter(
          bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= hammingMax))
      .select($"a_id", $"b_id",
        bit_count($"a_sh".bitwiseXOR($"b_sh")).cast("long").as("hamming"))
  }

  /** One survivor (min id) per near-dup cluster, with the cluster size:
    * `(<idCol>, n_merged)` — the user-facing dedup output. Exact duplicates
    * land in the same cluster for free (jaccard 1). Clustering is the
    * hybrid [[Clustering.connectedComponents]]. */
  def survivors(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", threshold: Double = 0.2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = pairs(docs, idCol, textCol, threshold = threshold)
      .select($"a_id", $"b_id")
    Clustering.connectedComponents(docs.select(col(idCol).as("id")), p)
      .groupBy($"cluster_id").agg(count(lit(1)).as("n_merged"))
      .select($"cluster_id".as(idCol), $"n_merged")
  }
}
