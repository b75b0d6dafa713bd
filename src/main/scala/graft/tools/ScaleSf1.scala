package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100× REHEARSAL: materialize a deterministic sf1 (10 × sf0.1)
  * twin of the corpus tables and time the heavy operator family on
  * both, printing one `scale_ratio_sf1` JSON line (committed as
  * `scale_sf1.json`). `scale_ratio` in the bench proves sf0.01→sf0.1
  * (10×); this adds the sf0.1→sf1 point so the 100 TB posture rests on
  * two measured decades, not one.
  *
  * The scaled tables are MUTATED copies, not replicas — replicas would
  * hand the dedup family a degenerate everything-is-a-dup corpus and
  * the ANN family a 10-fold-degenerate metric space, measuring a
  * different (harder) problem than "same distribution, 10× mass":
  *  - documents: every 5th word of copy k is rewritten to a copy-unique
  *    token, so shingle Jaccard against the source document drops far
  *    below the dedup thresholds (duplicate RATE stays ~the sf0.1
  *    rate instead of exploding to 10 copies/doc);
  *  - embeddings: copy k perturbs each component with a deterministic
  *    hash noise (~±0.05), preserving the distribution's shape while
  *    keeping copies metrically distinct.
  * Everything is seeded by (copy, id) — two runs build byte-identical
  * inputs. Non-corpus tables are carried over unscaled (the heavies
  * read documents/embeddings; the carry-over only keeps `Tables`
  * loaders working).
  *
  * Usage: `sbt "runMain graft.tools.ScaleSf1 [sf01Dir] [sf1Dir]"`
  * (defaults /root/testdata/sf0.1 → /tmp/graft_sf1). */
object ScaleSf1 {

  def scaleDocuments(df: DataFrame, copies: Int): DataFrame = {
    val n = copies
    val base = df.selectExpr("doc_id", "text", "lang", "source", "n_chars")
    val maxId = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
    (0 until n).map { k =>
      if (k == 0) base
      else base.select(
        (col("doc_id") + lit(k * maxId)).as("doc_id"),
        array_join(expr(
          s"transform(split(text, ' '), (x, i) -> " +
          s"CASE WHEN (i + $k) % 5 = 0 THEN concat('r$k', 'x', i) " +
          "ELSE x END)"), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(df: DataFrame, copies: Int): DataFrame = {
    val base = df.selectExpr("vec_id", "embedding", "label")
    val maxId = base.agg(max(col("vec_id"))).head.getLong(0) + 1L
    (0 until copies).map { k =>
      if (k == 0) base
      else base.select(
        (col("vec_id") + lit(k * maxId)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> cast(x + " +
          s"(pmod(hash(vec_id, i, $k), 1000) - 500) / 10000.0 " +
          "as float))").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- build the sf1 twin (idempotent: skip when already present) ----
    val marker = new java.io.File(s"$sf1/_SCALE_OK")
    if (!marker.exists()) {
      new java.io.File(sf1).mkdirs()
      scaleDocuments(spark.read.parquet(s"$sf01/documents.parquet"), 10)
        .repartition(cpus).write.mode("overwrite")
        .parquet(s"$sf1/documents.parquet")
      scaleEmbeddings(spark.read.parquet(s"$sf01/embeddings.parquet"), 10)
        .repartition(cpus).write.mode("overwrite")
        .parquet(s"$sf1/embeddings.parquet")
      // carry the non-corpus tables over unscaled so Tables loaders work
      val src = new java.io.File(sf01).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          f.getName != "documents.parquet" && f.getName != "embeddings.parquet")
      src.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(sf1, f.getName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      marker.createNewFile()
      ()
    }

    // ---- the heavy family, identical harness shapes as Bench ----
    def queryFn(name: String): String => () => Unit = dir => () => {
      graft.Queries.all.find(_._1 == name) match {
        case Some((_, q)) => q.fn(spark, dir).count(); ()
        case scala.None => throw new IllegalArgumentException(name)
      }
    }
    val baseFns: Seq[(String, String => () => Unit)] = Seq(
      "dd_minhash_lsh" -> queryFn("dd_minhash_lsh"),
      "dd_semdedup" -> queryFn("dd_semdedup"),
      "cp_assembly" -> queryFn("cp_assembly"),
      "dd_pagerank" -> queryFn("dd_pagerank"),
      "ann_ivf_pq" -> queryFn("ann_ivf_pq"),
      "dd_exact_substr" -> queryFn("dd_exact_substr"),
      "cp_pack_ids" -> queryFn("cp_pack_ids"),
      "ta_bpe_ids" -> queryFn("ta_bpe_ids"),
      "ann_pq_train" -> (dir => () => {
        graft.operators.Ann.trainPqCodebooks(
          graft.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding"))); ()
      }),
      "ann_ivf_pq_train" -> (dir => () => {
        graft.operators.Ann.ivfPqTrain(
          graft.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding")), kCentroids = 16); ()
      }))
    // BINDING-CAP twin lines: the uncapped train ratios above scale
    // with the corpus because the 65,536-vector default cap is far
    // above both measured corpus sizes — they demonstrate the
    // pre-plateau regime, not the production one. Setting the cap to
    // the SMALL corpus size makes it binding at sf1 (same training
    // work at both scales), so the measured ratio isolates what
    // training costs once the sample cap rules: ~1.0 + the scan.
    val cap = spark.read.parquet(s"$sf01/embeddings.parquet")
      .count().toInt
    val cappedFns: Seq[(String, String => () => Unit)] = Seq(
      s"ann_pq_train_cap$cap" -> (dir => () => {
        graft.operators.Ann.trainPqCodebooks(
          graft.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding")),
          maxTrainVectors = cap); ()
      }),
      s"ann_ivf_pq_train_cap$cap" -> (dir => () => {
        graft.operators.Ann.ivfPqTrain(
          graft.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding")),
          kCentroids = 16, maxTrainVectors = cap); ()
      }))
    val fns = baseFns ++ cappedFns
    def timeIt(f: () => Unit): Double = {
      // min of 2: first run absorbs codegen/JIT for the shape
      val ts = (0 until 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val rows = fns.map { case (name, mk) =>
      val small = timeIt(mk(sf01))
      val big = timeIt(mk(sf1))
      val r = big / math.max(small, 1e-9)
      System.err.println(f"[scale-sf1] $name%-18s sf0.1 $small%7.2fs   " +
        f"sf1 $big%7.2fs   ratio $r%5.2f")
      (name, small, big, r)
    }
    val json = rows.map { case (n, s, b, r) =>
      f""""$n":{"sf0_1":$s%.3f,"sf1":$b%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_ratio_sf1","copies":10,"ratios":$json}""")
    spark.stop()
  }
}
