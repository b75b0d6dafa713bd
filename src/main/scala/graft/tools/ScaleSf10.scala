package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The THIRD measured decade: materialize a deterministic sf10 twin
  * (10 × the sf1 rehearsal twin → 100 × sf0.1: 500k documents, 200k
  * embeddings) and time the PRODUCTION-POSTURE heavy lines on sf1 vs
  * sf10, printing one `scale_ratio_sf10` JSON line (committed as
  * `scale_sf10.json`). With `scale_ratio` (sf0.01→sf0.1) and
  * `scale_sf1.json` (sf0.1→sf1) this puts the 100 TB posture on THREE
  * measured decades — a ratio that holds at one decade but drifts at
  * the next is exactly what a single rehearsal cannot see. Expected
  * profiles: binding-cap training ~1.0-1.5 per decade (flat work +
  * the scan); linear-with-capped-blocking operators (minhash, band-pair
  * simhash) ≤ ~10 and in practice 2-3 while fixed cost amortizes;
  * BATCH semantic dedup is O(n^1.5) BY CONSTRUCTION at the optimal
  * single-level K = √n (assignment n·K plus within-cell pairs n·(n/K)
  * both land on n^1.5 — any fixed K makes one of the two terms worse),
  * so its per-decade ratio legitimately RISES toward 10^1.5 ≈ 31.6 as
  * fixed costs amortize; measured drift across decades (2.0 → ~8)
  * is that profile emerging, not a regression. `dd_semdedup_two`
  * ([[graft.operators.Ann.semanticDedupTwoLevel]]) is the O(n^{4/3})
  * contrast: coarse+residual-fine composite cells whose per-decade
  * ceiling is 10^{4/3} ≈ 21.5 — kept only if the measured ratio
  * actually lands under the single-level line at these scales. The
  * serving-side story is different: per-QUERY probe cost stays O(√n),
  * which is what the ann_ivf_pq line and its recall audit measure.
  *
  * The twin reuses [[ScaleSf1]]'s mutation machinery (every 5th word
  * rewritten per copy, hash-noise on embeddings), applied to the sf1
  * twin — second-generation copies get fresh copy-unique tokens, so the
  * duplicate RATE stays flat rather than exploding to 100 copies/doc.
  * Training caps are the SAME absolute budgets the sf1 rehearsal used
  * (the sf0.1 corpus sizes), so training work is constant across all
  * three decades and the measured growth isolates scan + assignment.
  *
  * Usage: `sbt "runMain graft.tools.ScaleSf10 [sf1Dir] [sf10Dir] [sf01Dir]"`
  * (defaults /tmp/graft_sf1 → /tmp/graft_sf10, caps from
  * /root/testdata/sf0.1). Builds the sf1 twin first if missing. */
object ScaleSf10 {

  /** The dedup SERVING contrast at this decade (the [[ScaleSf1]] lines,
    * same fixed sf0.1 daily batch, stores built from the sf1 and sf10
    * corpora): the v1 stored probe re-aggregates the store per batch —
    * its ratio reads the corpus; the v2 index probe reads build-once,
    * partition-pruned tables — its ratio should stay ~1 while the store
    * grows another decade. Stores build untimed (the nightly job). */
  /** `(line fns, per-scale v1 hashes-table row counts)` — the row counts
    * are the v1 probe's PER-PROBE aggregate input (its `collect_set`
    * consumes the whole table every batch; 10×/decade by construction),
    * against the v2 probe's corpus-side aggregate input of ZERO (no
    * store-sized aggregate exists in its plan — `SignatureIndexSpec`
    * pins the shape). Wall-clock at twin scales is floor-dominated for
    * both probes (a 25M-row aggregate is sub-second on local[32]); the
    * row counts are what carry to 100 TB. */
  private def sigProbeFns(spark: SparkSession, sf1: String, sf10: String,
                          sf01: String)
      : (Seq[(String, String => () => Unit)], () => Map[String, Long]) = {
    val batch = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_sigscale10").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
    }))
    // LAZY store builds: the first sig line (timed LAST in the fns
    // order) triggers them, so the base lines run in the same JVM
    // environment as prior rounds' artifacts — an eager build here was
    // measured perturbing the semdedup lines that follow it
    lazy val stores: Map[String, (String, String)] =
      Seq(sf1 -> "sf1", sf10 -> "sf10").map { case (dir, tag) =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val v1 = s"$root/v1_$tag"
        val v2 = s"$root/v2_$tag"
        graft.operators.NearDup.writeReferenceSignatures(docs, v1)
        graft.operators.NearDup.writeSignatureIndex(docs, v2)
        spark.catalog.clearCache()
        dir -> (v1, v2)
      }.toMap
    val aggRows = () => Seq(sf1 -> "sf1", sf10 -> "sf10")
      .map { case (dir, tag) =>
        s"v1_probe_agg_rows_$tag" ->
          spark.read.parquet(s"${stores(dir)._1}/hashes").count()
      }.toMap
    (Seq(
      "dd_stored_probe" -> ((dir: String) => () => {
        graft.operators.NearDup.dedupAgainstStored(
          batch, stores(dir)._1).count()
        spark.catalog.clearCache(); ()
      }),
      "dd_index_probe" -> ((dir: String) => () => {
        graft.operators.NearDup.dedupAgainstIndexScoped(
          batch, stores(dir)._2)(_.count()); ()
      })), aggRows)
  }

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf10 = args.drop(1).headOption.getOrElse("/tmp/graft_sf10")
    val sf01 = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.Engine.applyJoinStrategy(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(new java.io.File(s"$sf1/_SCALE_OK").exists(),
      s"sf1 twin missing at $sf1 — run graft.tools.ScaleSf1 first")
    val marker = new java.io.File(s"$sf10/_SCALE_OK")
    if (!marker.exists()) {
      new java.io.File(sf10).mkdirs()
      ScaleSf1.scaleDocuments(
          spark.read.parquet(s"$sf1/documents.parquet"), 10)
        .repartition(cpus).write.mode("overwrite")
        .parquet(s"$sf10/documents.parquet")
      ScaleSf1.scaleEmbeddings(
          spark.read.parquet(s"$sf1/embeddings.parquet"), 10)
        .repartition(cpus).write.mode("overwrite")
        .parquet(s"$sf10/embeddings.parquet")
      marker.createNewFile()
      ()
    }

    // same ABSOLUTE caps as the sf1 rehearsal (sf0.1 corpus sizes):
    // binding at both measured scales here
    val embCap = spark.read.parquet(s"$sf01/embeddings.parquet").count().toInt
    val docCap = spark.read.parquet(s"$sf01/documents.parquet").count()

    def emb(dir: String) = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))

    val baseFns: Seq[(String, String => () => Unit)] = Seq(
      "dd_semdedup" -> (dir => () => {
        graft.operators.Ann.semanticDedup(emb(dir),
          threshold = 0.35, kCentroids = 0, iters = 5, seed = "ivf",
          maxTrainVectors = embCap).count(); ()
      }),
      // the O(n^{4/3}) contrast line: coarse+residual-fine composite
      // cells at auto-cbrt K per level — same threshold/caps, so the
      // per-decade ratio against dd_semdedup reads the exponent change
      "dd_semdedup_two" -> (dir => () => {
        graft.operators.Ann.semanticDedupTwoLevel(emb(dir),
          threshold = 0.35, iters = 5, seed = "ivf",
          maxTrainVectors = embCap).count(); ()
      }),
      "ann_ivf_pq" -> (dir => () => {
        val e = emb(dir)
        val (cents, cb) = graft.operators.Ann.ivfPqTrain(e, kCentroids = 0,
          subspaces = 8, codes = 16, maxTrainVectors = embCap)
        val nProbe = math.max(2,
          math.round(math.sqrt(cents.length.toDouble)).toInt)
        graft.operators.Ann.ivfPqTopKFrom(e, col("vec_id") < 10, cents, cb,
          k = 5, nProbe = nProbe).count(); ()
      }),
      "dd_minhash_lsh" -> (dir => () => {
        graft.operators.NearDup.pairs(
          graft.Tables.documents(spark, dir)).count(); ()
      }),
      "dd_simhash_pairs" -> (dir => () => {
        graft.operators.NearDup.simhashPairs(
          graft.Tables.documents(spark, dir)).count(); ()
      }),
      s"ann_ivf_pq_train_cap$embCap" -> (dir => () => {
        graft.operators.Ann.ivfPqTrain(emb(dir),
          kCentroids = 16, maxTrainVectors = embCap); ()
      }),
      s"cp_qc_train_cap$docCap" -> (dir => () => {
        graft.operators.Corpus.qualityClassifierTrain(
          graft.Tables.documents(spark, dir), col("lang") === "en",
          buckets = 256, iters = 4, lr = BigDecimal("0.02"),
          maxTrainDocs = docCap); ()
      }))
    val (sigFns, sigAggThunk) = sigProbeFns(spark, sf1, sf10, sf01)
    val fns = baseFns ++ sigFns
    def timeIt(f: () => Unit): Double = {
      val ts = (0 until 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val rows = fns.map { case (name, mk) =>
      val small = timeIt(mk(sf1))
      val big = timeIt(mk(sf10))
      val r = big / math.max(small, 1e-9)
      System.err.println(f"[scale-sf10] $name%-24s sf1 $small%7.2fs   " +
        f"sf10 $big%7.2fs   ratio $r%5.2f")
      (name, small, big, r)
    }
    // production-rerank quality at the big end: the √n probe must still
    // find the neighbors at 200k vectors
    def ivfPqAutoRecall(dir: String): Double = {
      val e = emb(dir)
      val isQuery = col("vec_id") < 10
      val (cents, cb) = graft.operators.Ann.ivfPqTrain(e, kCentroids = 0,
        subspaces = 8, codes = 16, maxTrainVectors = embCap)
      val nProbe = math.max(2,
        math.round(math.sqrt(cents.length.toDouble)).toInt)
      graft.operators.Ann.recallAtK(
        graft.operators.Ann.bruteForceTopK(e, isQuery, 10),
        graft.operators.Ann.ivfPqTopKRerank(e, isQuery, cents, cb,
          k = 10, nProbe = nProbe, refine = 600))
    }
    val rec = ivfPqAutoRecall(sf10)
    System.err.println(f"[scale-sf10] ann_ivf_pq auto-K 4bit-rerank " +
      f"recall@10 at sf10: $rec%.2f")
    val json = rows.map { case (n, s, b, r) =>
      f""""$n":{"sf1":$s%.3f,"sf10":$b%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val sigAggRows = sigAggThunk()
    val aggJson = sigAggRows.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_ratio_sf10","copies":10,"ratios":$json,""" +
      f""""recall_at_10":{"ann_ivf_pq_rerank_sf10":$rec%.3f},""" +
      s""""dedup_serving":$aggJson}""")
    spark.stop()
  }
}
