package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search as reusable operators — the library
  * form of the `ann_*` queries. Input convention: a corpus frame with
  * `vec_id: long` and `embedding: array<float|double>`; `isQuery` marks the
  * query rows. All variants emit `(q_id, n_id, cosine, rk)` with
  * cosine rounded to 6 places and rk 1..k per query.
  *
  * Scale shapes: the query set always broadcasts (queries ≪ corpus); the
  * exact scorer reads the corpus once; the LSH/IVF variants shuffle only
  * id/bucket/score scalars — embeddings never ride a candidate shuffle,
  * they join back by key at scoring time.
  */
object Ann {

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Exact brute-force top-k: broadcast query set × one corpus scan, the
    * one-pass exact scorer. Ranking runs through the custom bounded-heap
    * [[graft.plans.TopKPerKey]] (map-side partials, ≤k·queries rows
    * shuffle) with the final row_number ranking only pruned rows. */
  def bruteForceTopK(corpus: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val e = corpus.withColumn("nrm", VF.norm2(col("embedding")))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("nrm").as("q_nrm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    val topk = graft.plans.TopKPerKey(scored, Seq("q_id"),
      Seq(graft.plans.TopKPerKey.desc("cosine"),
          graft.plans.TopKPerKey.asc("n_id")), k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    topk.withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Single-table LSH: candidates share a random-hyperplane sign bucket
    * ([[VF.lshBucket]]) — per-query work drops from O(corpus) to the
    * bucket's share. */
  def lshTopK(corpus: DataFrame, isQuery: Column, k: Int,
              nBits: Int = 4, dims: Int = 64): DataFrame = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      VF.lshBucket(col("embedding"), nBits, dims).as("bucket"),
      VF.norm2(col("embedding")).as("nrm"))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("bucket"), col("nrm").as("q_nrm"))
    val scored = e.join(q, Seq("bucket")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    rank(scored, k)
  }

  /** Multi-probe LSH — recall at one table's storage cost: each query
    * probes its own bucket PLUS the `nBits` buckets at hamming distance 1
    * (one sign bit flipped). A near neighbor that lands across one
    * hyperplane — by far the most likely miss — is recovered, so recall
    * approaches the multi-table variant's without building or storing any
    * second table (at 100 TB the corpus index is the dominant cost; the
    * probe fan-out only multiplies the tiny query side). Buckets of the
    * probe set are pairwise distinct, so no candidate dedup is needed:
    * each (query, neighbor) pair can match on at most one probe row. */
  def lshMultiProbeTopK(corpus: DataFrame, isQuery: Column, k: Int,
                        nBits: Int = 4, dims: Int = 64): DataFrame = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      VF.lshBucket(col("embedding"), nBits, dims).as("bucket"),
      VF.norm2(col("embedding")).as("nrm"))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("bucket"), col("nrm").as("q_nrm"))
    // fan the query side out to its nBits+1 probe buckets; the corpus side
    // keeps exactly one row per vector
    val probes = q.select(col("q_id"), col("q_vec"), col("q_nrm"),
      explode(array(col("bucket") +: (0 until nBits).map(b =>
        col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val scored = e.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    rank(scored, k)
  }

  /** Multi-table LSH — the recall upgrade: `tables` independent hyperplane
    * sets; a pair is a candidate if ANY table buckets them together
    * (hit probability 1-(1-p^nBits)^tables). Candidates dedup as LONG pairs
    * before any vector moves. */
  def lshMultiTopK(corpus: DataFrame, isQuery: Column, k: Int,
                   nBits: Int = 4, dims: Int = 64, tables: Int = 4): DataFrame = {
    val buck = corpus.select(col("vec_id"), explode(array((0 until tables).map(l =>
        struct(lit(l).as("tbl"),
          VF.lshBucket(col("embedding"), nBits, dims, s"t$l").as("bucket"))): _*))
        .as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // isQuery must be a predicate over vec_id (it is applied to derived
    // frames that carry only the id)
    val qb = buck.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cand = buck.join(qb, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
    val ev = corpus.withColumn("nrm", VF.norm2(col("embedding")))
    val qv = ev.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("nrm").as("q_nrm"))
    val scored = cand
      .join(broadcast(qv), "q_id")
      .join(ev.select(col("vec_id").as("n_id"), col("embedding"), col("nrm")), "n_id")
      .select(col("q_id"), col("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    rank(scored, k)
  }

  /** Recall@k of an approximate result against the exact one: the fraction
    * of true top-k neighbors the approximate variant returned, averaged
    * over queries. Both frames carry `(q_id, n_id)`; the join and counts
    * shuffle only id pairs — O(k·queries) rows, never vectors — so the
    * measurement is safe to run at any corpus scale alongside the search
    * itself. */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val t = exact.select(col("q_id"), col("n_id"))
    val denom = t.count()
    if (denom == 0) 1.0
    else t.join(approx.select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id")).count().toDouble / denom
  }

  /** Train the IVF coarse quantizer: spherical k-means over a
    * deterministic sample, Lloyd iterations with exact-decimal centroid
    * updates so the trained centroids are bit-identical across engines
    * and runs (the property that keeps the trained index
    * oracle-checkable).
    *
    * Design, piece by piece:
    *  - SAMPLE: the md5(vec_id)-rate draw (same construction as
    *    [[Corpus.mixWeighted]]) — deterministic, partition-independent.
    *    At 100 TB nobody trains on the full corpus; `sampleRate` bounds
    *    the training set while assignment still covers every vector.
    *  - INIT: the `k` vectors with the smallest md5(seed_vec_id) — a
    *    seeded uniform draw (hash order is independent of insertion or
    *    partition order), the "sampled init, fixed seed" half of
    *    k-means‖ without its weighted rounds, which cannot be reproduced
    *    portably in the SQL oracle.
    *  - K: `kCentroids`, defaulting to ~√n when 0 — cells hold ~√n
    *    vectors each, the classic balance between probe fan-out (O(K))
    *    and cell scan cost (O(n/K)).
    *  - LLOYD step: assign every sampled vector to its nearest centroid
    *    by round(cosine,6) with cell-id tiebreak (a partial+final
    *    aggregate, not a window — only (vec_id, cell, score) triples
    *    shuffle); the new centroid is the elementwise SUM of its
    *    members, accumulated in DECIMAL(38,12). Cosine is
    *    scale-invariant, so the sum IS the spherical-k-means mean
    *    direction — and unlike a double sum or a mean it is exact and
    *    order-independent, so Spark and the SQL oracle agree
    *    bit-for-bit. Empty cells keep their previous centroid.
    *  - Driver traffic per iteration: K·dims decimal sums — the model,
    *    not the data (same O(K·dims) cost as broadcasting the centroids
    *    back out each round).
    *
    * Returns the centroids as (cell 0..k-1, vector) in init-hash order. */
  def trainCentroids(corpus: DataFrame, kCentroids: Int = 0, iters: Int = 5,
                     seed: String = "ivf",
                     sampleRate: Double = 1.0): Array[Array[Double]] = {
    require(iters >= 1, "need at least one Lloyd iteration")
    val base0 = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val base = (if (sampleRate >= 1.0) base0 else {
      val u = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000L
      base0.filter(u < (lit(sampleRate) * 10000L).cast("long"))
    }).persist() // the training SAMPLE (sampleRate-bounded), not the corpus
    try {
      val k = if (kCentroids > 0) kCentroids
        else math.max(2, math.round(math.sqrt(base.count().toDouble)).toInt)
      var cents: Array[Array[Double]] = base
        .select(col("emb"),
          md5(concat(lit(s"${seed}_"), col("vec_id").cast("string"))).as("hk"),
          col("vec_id"))
        .orderBy(col("hk"), col("vec_id")).limit(k)
        .select(col("emb")).collect()
        .map(_.getSeq[Double](0).toArray)
      for (_ <- 0 until iters) {
        val cent = centroidFrame(base.sparkSession, cents)
        val scored = base.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("cell"),
            round(VF.cosineWithNorms(VF.dot(col("emb"), col("c_vec")),
              VF.norm2(col("emb")), col("c_nrm")), 6).as("cscore"))
        // argmax as an aggregate: min over (-score, cell) = highest score,
        // smallest cell on ties — identical to the oracle's row_number
        // ranking, but with map-side partials instead of a window
        val best = scored
          .groupBy(col("vec_id"))
          .agg(min(struct((-col("cscore")).as("neg"), col("cell").as("cell")))
            .as("b"))
          .select(col("vec_id"), col("b.cell").as("cell"))
        val sums = best.join(base, "vec_id")
          .select(col("cell"), posexplode(col("emb")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
            .as("s"))
          .collect() // O(K·dims) rows — the model update, never the data
        val next = cents.map(_.clone())
        sums.groupBy(_.getLong(0)).foreach { case (cell, rows) =>
          val v = new Array[Double](cents(cell.toInt).length)
          rows.foreach(r => v(r.getInt(1)) = r.getDecimal(2).doubleValue())
          next(cell.toInt) = v
        }
        cents = next
      }
      cents
    } finally base.unpersist()
  }

  /** (cell, c_vec, c_nrm) frame from driver-held centroids — K·dims
    * doubles, always broadcast-sized by construction. */
  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                            cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cell", "c_vec")
      .select(col("cell"), col("c_vec"), VF.norm2(col("c_vec")).as("c_nrm"))
  }

  /** The shared front half of every trained-quantizer entry point: the
    * corpus cast to double with norms, and the trained centroid table
    * keyed as `c_id` — one place to change the index frame shape. */
  private def trainedIndex(corpus: DataFrame, kCentroids: Int, iters: Int,
                           seed: String,
                           sampleRate: Double): (DataFrame, DataFrame) = {
    val cents = trainCentroids(corpus, kCentroids, iters, seed, sampleRate)
    val e = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .withColumn("nrm", VF.norm2(col("embedding")))
    val cent = centroidFrame(corpus.sparkSession, cents)
      .select(col("cell").as("c_id"), col("c_vec"), col("c_nrm"))
    (e, cent)
  }

  /** IVF with a TRAINED quantizer: [[trainCentroids]] then the same
    * assignment/probe/scoring machinery as [[ivfTopK]]. This is the
    * production IVF section default — the predicate-centroid variant
    * below remains for reproducing a fixed index layout. */
  def ivfTopKTrained(corpus: DataFrame, isQuery: Column, k: Int,
                     nProbe: Int = 2, kCentroids: Int = 0, iters: Int = 5,
                     seed: String = "ivf", sampleRate: Double = 1.0): DataFrame = {
    val (e, cent) = trainedIndex(corpus, kCentroids, iters, seed, sampleRate)
    ivfTopKFrom(e, isQuery, cent, k, nProbe)
  }

  /** Vector→cell populations of a trained quantizer over the full corpus:
    * `(cell, n)` — the bench derives the max/mean imbalance from this (a
    * lopsided quantizer makes probe cost skew even when wall time at
    * test scale looks fine). */
  def ivfCellCounts(corpus: DataFrame, kCentroids: Int = 0, iters: Int = 5,
                    seed: String = "ivf", sampleRate: Double = 1.0): DataFrame = {
    val (e, cent) = trainedIndex(corpus, kCentroids, iters, seed, sampleRate)
    assignCells(e, cent).groupBy(col("cell")).agg(count(lit(1)).as("n"))
  }

  /** SemDeDup (Abbas et al. 2023) — SEMANTIC dedup: cluster the corpus
    * with the TRAINED quantizer ([[trainCentroids]]), generate cosine
    * pairs only WITHIN each cell, connect, keep the min-id survivor per
    * group. The cells are what make it scale: candidate generation drops
    * from O(n²) to O(Σ cell²), and the cells come from the data (k-means)
    * instead of an external label — this is exactly the published
    * SemDeDup recipe (k-means the embeddings, dedup within clusters).
    * Pair generation runs through [[Blocking.boundedCosinePairs]] with
    * `cell` as the blocking label, so a degenerate cell (a
    * mass-duplicated embedding) LSH-sub-buckets past `maxBlock` instead
    * of going quadratic — observed, never silent.
    *
    * @return `(vec_id, n_merged)` — one row per SURVIVOR (min id of its
    *         semantic-duplicate group), with the group size.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double = 0.7,
                    kCentroids: Int = 0, iters: Int = 5,
                    seed: String = "ivf", sampleRate: Double = 1.0,
                    maxBlock: Long = 10000): DataFrame = {
    val (e0, cent) = trainedIndex(corpus, kCentroids, iters, seed, sampleRate)
    // EXACT-duplicate pre-collapse (the [[NearDup.dedupAgainstReference]]
    // trick, vector edition): identical non-zero embeddings have cosine
    // exactly 1 ≥ any threshold, AND they agree on every LSH sign bit —
    // so a mass-duplicated embedding would defeat the sub-bucket cap and
    // go quadratic inside its cell. Collapse each exact group to its
    // min-id representative BEFORE anything quadratic runs: the result
    // is unchanged, the cost of m copies drops from O(m²) to O(1).
    // Zero-norm vectors stay singletons (their pairwise cosine is
    // DEFINED as 0 here, so the pair path would never merge them).
    val byVec = e0.filter(col("nrm") > 0.0)
      .groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("rep"))
    val repOf = e0.join(byVec, Seq("embedding"), "left")
      .select(col("vec_id"), coalesce(col("rep"), col("vec_id")).as("rep"))
    val reps = e0.join(repOf.filter(col("vec_id") === col("rep"))
      .select(col("vec_id")), "vec_id")
    val labeled = assignCells(reps, cent).join(reps, "vec_id")
      .select(col("vec_id"), col("cell").as("label"),
        col("embedding"), col("nrm"))
    val pairs = Blocking.boundedCosinePairs(labeled, maxBlock)
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"))
    // components over representatives; every original id then follows its
    // rep into the component, so survivors/counts are over ORIGINAL ids
    val comps = Clustering.connectedComponents(
      reps.select(col("vec_id").as("id")), pairs)
    repOf.join(comps, repOf("rep") === comps("id"))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_merged"))
      .select(col("cluster_id").as("vec_id"), col("n_merged"))
  }

  /** IVF — coarse-quantizer cells: `isCentroid` rows partition the corpus
    * (one-time assignment; only id/cell/score triples shuffle), queries
    * probe their `nProbe` nearest cells: O(K + corpus/K·nProbe) per query.
    * Argmax decisions use round(6) + id tiebreak so results are
    * deterministic and oracle-reproducible. */
  def ivfTopK(corpus: DataFrame, isQuery: Column, isCentroid: Column,
              k: Int, nProbe: Int = 2): DataFrame = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      VF.norm2(col("embedding")).as("nrm"))
    val cent = e.filter(isCentroid)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("nrm").as("c_nrm"))
    ivfTopKFrom(e, isQuery, cent, k, nProbe)
  }

  /** Corpus×centroid cell ranking shared by every IVF path: one broadcast
    * of the centroid table, (vec_id, c_id, score) triples ranked per
    * vector by round(6)-score desc, c_id asc. */
  private def rankedCells(e: DataFrame, cent: DataFrame): DataFrame = {
    val scored = e.join(broadcast(cent))
      .select(col("vec_id"), col("c_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("embedding"), col("c_vec")), col("nrm"), col("c_nrm")), 6)
          .as("cscore"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("c_id"))
    scored.withColumn("crk", row_number().over(wAssign))
  }

  /** Nearest-cell assignment `(vec_id, cell)` against a (c_id, c_vec,
    * c_nrm) centroid table. */
  private def assignCells(e: DataFrame, cent: DataFrame): DataFrame =
    rankedCells(e, cent).filter(col("crk") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))

  private def ivfTopKFrom(e: DataFrame, isQuery: Column, cent: DataFrame,
                          k: Int, nProbe: Int): DataFrame = {
    val ranked = rankedCells(e, cent)
    val assigned = ranked.filter(col("crk") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
      .join(e, "vec_id")
    val qprobe = ranked.filter(isQuery && col("crk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("nrm").as("q_nrm")), "q_id")
    val cand = assigned.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    rank(cand, k)
  }

  /** Materialize the IVF index ON DISK: every vector assigned to its
    * nearest centroid cell, written parquet PARTITIONED BY cell (plus the
    * small centroid table beside it). This is the piece that makes IVF
    * pay at 100 TB: [[ivfIndexTopK]]'s cell filter becomes a PARTITION
    * prune, so a query scans nProbe/K of the files — the un-probed cells'
    * parquet is never opened, instead of "read everything and filter".
    * Assignment is the same round(6)+id-tiebreak argmax as [[ivfTopK]],
    * so the on-disk index answers queries identically to the in-memory
    * path. */
  def ivfIndexWrite(corpus: DataFrame, isCentroid: Column, path: String): Unit = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      VF.norm2(col("embedding")).as("nrm"))
    val cent = e.filter(isCentroid)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("nrm").as("c_nrm"))
    ivfIndexWriteFrom(e, cent, path)
  }

  /** [[ivfIndexWrite]] with a TRAINED quantizer ([[trainCentroids]]) — the
    * 100 TB index build: k-means cells sized to the data distribution
    * instead of K arbitrary member rows, same partition-pruned on-disk
    * layout, same [[ivfIndexTopK]] on the query side. */
  def ivfIndexWriteTrained(corpus: DataFrame, path: String,
                           kCentroids: Int = 0, iters: Int = 5,
                           seed: String = "ivf",
                           sampleRate: Double = 1.0): Unit = {
    val (e, cent) = trainedIndex(corpus, kCentroids, iters, seed, sampleRate)
    ivfIndexWriteFrom(e, cent, path)
  }

  private def ivfIndexWriteFrom(e: DataFrame, cent: DataFrame,
                                path: String): Unit = {
    val assigned = assignCells(e, cent).join(e, "vec_id")
    assigned.select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    cent.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Query a [[ivfIndexWrite]] index: probe cells are decided against the
    * broadcast centroid table, the O(queries·nProbe) probed-cell id set is
    * collected (tiny, by construction), and the cells scan is filtered by
    * that LITERAL list — which Spark turns into partition pruning, the
    * point of the on-disk layout. Query vectors need not be index members
    * (self-matches are excluded by id). Emits `(q_id, n_id, cosine, rk)`
    * like every other variant. */
  def ivfIndexTopK(queries: DataFrame, path: String, k: Int,
                   nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val cent = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      VF.norm2(col("embedding")).as("q_nrm"))
    val qscored = q.join(broadcast(cent))
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("c_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")), 6)
          .as("cscore"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cscore").desc, col("c_id"))
    val probes = qscored.withColumn("crk", row_number().over(wProbe))
      .filter(col("crk") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("c_id").as("cell"))
    // O(queries·nProbe) longs to the driver — makes the cell predicate a
    // literal IN-list the parquet source prunes partitions with
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    // pin the inferred partition column `cell` to LONG at the source: type
    // inference yields IntegerType when the ids happen to fit an int, and
    // the join keys / IN-list literals are LongType — pruning today rides
    // an implicit up-cast that a Spark upgrade could stop pushing. With the
    // schema pinned, both sides are exactly LongType and the prune is not
    // at the mercy of cast-insertion rules.
    val inferred = spark.read.parquet(s"$path/cells").schema
    val pinned = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == "cell") f.copy(dataType = org.apache.spark.sql.types.LongType)
      else f))
    val idx = spark.read.schema(pinned).parquet(s"$path/cells")
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    val scored = idx.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(VF.cosineWithNorms(
          VF.dot(col("q_vec"), col("embedding")), col("q_nrm"), col("nrm")), 6)
          .as("cosine"))
    rank(scored, k)
  }
}
