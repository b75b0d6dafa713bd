package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The training-data operators as declarative pipeline SECTIONS: the same
  * JSON spec surface that drives the reference's transforms drives dedup
  * and ANN here. */
class TrainingSectionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = TestSpark.sf

  test("dedup_near section: documents in, survivors out, via JSON spec") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"dd","name":"dedup_near","config":{"threshold":"0.2"}}],
        "edges":[["src","dd"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("doc_id", "n_merged"))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val survivors = out.count()
    assert(survivors > 0 && survivors <= total)
    // merged counts account for every document exactly once
    assert(out.agg(org.apache.spark.sql.functions.sum("n_merged"))
      .head().getLong(0) == total)
  }

  test("near_dup_pairs section emits verified (a_id, b_id, jaccard)") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"p","name":"near_dup_pairs","config":{"threshold":"0.5"}}],
        "edges":[["src","p"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("a_id", "b_id", "jaccard"))
    val rows = out.collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getLong(0) < r.getLong(1)))
  }

  test("ann_topk section runs each variant from a spec") {
    for (variant <- Seq("brute", "lsh", "lsh_multi", "ivf")) {
      val extra = if (variant == "ivf") ""","centroid_where":"vec_id < 8"""" else ""
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
          {"id":"ann","name":"ann_topk","config":{
            "variant":"$variant","k":"3","query_where":"vec_id < 4"$extra}}],
          "edges":[["src","ann"]]}"""
      val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      assert(out.columns.toSeq == Seq("q_id", "n_id", "cosine", "rk"), variant)
      val rows = out.collect()
      assert(rows.nonEmpty, s"$variant returned nothing")
      assert(rows.forall(r => r.getLong(0) < 4 && r.getLong(3) <= 3), variant)
    }
  }

  test("ann_topk opq variant: inline-trained == stored-model serving, rerank composes") {
    val root = java.nio.file.Files.createTempDirectory("opq_sect").toString
    val store =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"m","name":"opq_model_destination","config":{
          "path":"$root/model","subspaces":"4","codes":"8","opq_iters":"2"}}],
        "edges":[["src","m"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(store))
    def served(extra: String): Seq[(Long, Long, Double, Long)] = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
          {"id":"ann","name":"ann_topk","config":{
            "variant":"opq","k":"3","query_where":"vec_id < 4",
            "subspaces":"4","codes":"8","opq_iters":"2"$extra}}],
          "edges":[["src","ann"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
        .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    }
    val inline = served("")
    val stored = served(s""","model_path":"$root/model"""")
    assert(inline.nonEmpty)
    assert(inline == stored,
      "stored-model opq serving drifted from inline training")
    val refined = served(s""","model_path":"$root/model","refine":"10"""")
    assert(refined.nonEmpty && refined.forall(_._4 <= 3))
  }

  test("ann_topk: trained ivf defaults to the BALANCED quantizer") {
    import org.apache.spark.sql.functions.col
    def run(extra: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
          {"id":"ann","name":"ann_topk","config":{
            "variant":"ivf","k":"3","query_where":"vec_id < 4",
            "k_centroids":"8"$extra}}],
          "edges":[["src","ann"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
        .orderBy(col("q_id"), col("rk")).collect().toSeq
    }
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val balanced = graft.operators.Ann.ivfTopKTrainedBalanced(e,
        col("vec_id") < 4, 3, nProbe = 2, kCentroids = 8)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect().toSeq
    val raw = graft.operators.Ann.ivfTopKTrained(e, col("vec_id") < 4, 3,
        nProbe = 2, kCentroids = 8)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect().toSeq
    assert(run("") == balanced, "section default is not the balanced trainer")
    assert(run(""","balance_factor":"0"""") == raw,
      "balance_factor: 0 does not opt back into the raw trainer")
  }

  test("ann_topk: `refine` adds the exact-rerank pass (pq and ivf_pq)") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def run(variant: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
          {"id":"ann","name":"ann_topk","config":{
            "variant":"$variant","k":"3","query_where":"vec_id < 4",
            "codes":"16","refine":"15","k_centroids":"8"}}],
          "edges":[["src","ann"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
        .orderBy(col("q_id"), col("rk")).collect().toSeq
    }
    val pqRef = graft.operators.Ann.pqTopKRefined(e, col("vec_id") < 4, 3,
        codes = 16, refine = 15)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect().toSeq
    assert(run("pq") == pqRef)
    val ivfPqRef = graft.operators.Ann.ivfPqTopKRefined(e, col("vec_id") < 4,
        3, kCentroids = 8, codes = 16, refine = 15)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rk"))
      .orderBy(col("q_id"), col("rk")).collect().toSeq
    assert(run("ivf_pq") == ivfPqRef)
  }

  test("bpe model store: train destination, then serve via merges_path (no retrain)") {
    import org.apache.spark.sql.functions.col
    val store = java.nio.file.Files.createTempDirectory("bpe_store")
      .toString + "/merges"
    // direct round trip is bit-identical
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val trained = graft.operators.Corpus.bpeTrain(d, maxMerges = 12,
      minPairCount = 2L)
    graft.functions.Bpe.mergesWrite(trained, store, spark)
    assert(graft.functions.Bpe.mergesRead(spark, store) == trained)
    // the section pair: destination writes the store, the count section
    // serves against it and must equal the inline-training section
    val trainJson =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"bpe","name":"bpe_model_destination","config":{
          "path":"$store","max_merges":"12"}}],
        "edges":[["src","bpe"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(trainJson))
    def countJson(extra: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"cnt","name":"bpe_token_count","config":{
          "max_merges":"12"$extra}}],
        "edges":[["src","cnt"]]}"""
    val served = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(countJson(s""","merges_path":"$store"""")))
      .orderBy(col("doc_id")).collect().toSeq
    val inline = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(countJson("")))
      .orderBy(col("doc_id")).collect().toSeq
    assert(served == inline)
    // sparse store fails loudly
    val bad = java.nio.file.Files.createTempDirectory("bpe_bad")
      .toString + "/merges"
    import spark.implicits._
    Seq((0, "a b"), (2, "c d")).toDF("rank", "pair")
      .write.parquet(bad)
    val ex = intercept[IllegalArgumentException] {
      graft.functions.Bpe.mergesRead(spark, bad)
    }
    assert(ex.getMessage.contains("sparse"))
  }

  test("knn_classify section: majority-label prediction from a spec") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"knn","name":"knn_classify","config":{
          "k":"5","query_where":"vec_id < 8"}}],
        "edges":[["src","knn"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("q_id", "pred_label", "true_label"))
    assert(out.count() == 8)
  }

  test("ann_topk: LSH plane geometry follows project_dims") {
    // project_dims without an explicit `dims` must give the LSH planes
    // the PROJECTED dimensionality (16 here), not the 64-dim default —
    // ArrayDotProduct would otherwise silently dot a 16-component prefix
    // of each 64-dim plane
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"ann","name":"ann_topk","config":{
          "variant":"lsh","k":"3","query_where":"vec_id < 4",
          "project_dims":"16"}}],
        "edges":[["src","ann"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < 4 && r.getLong(3) <= 3))
  }

  test("ann_topk: conflicting dims and project_dims is a config error") {
    val e = intercept[IllegalArgumentException] {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
          {"id":"ann","name":"ann_topk","config":{
            "variant":"lsh","k":"3","query_where":"vec_id < 4",
            "project_dims":"16","dims":"64"}}],
          "edges":[["src","ann"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    }
    assert(e.getMessage.contains("project_dims"))
  }

  test("dataset_split and mm_decode sections compose in one pipeline") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"sp","name":"dataset_split","config":{"train_pct":"70","valid_pct":"20"}},
        {"id":"sq","name":"sql","config":{
          "query":"SELECT doc_id, split, encode(text, 'UTF-8') AS payload FROM input"}},
        {"id":"mm","name":"mm_decode","config":{"dims":"3"}}],
        "edges":[["src","sp"],["sp","sq"],["sq","mm"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    val splits = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "valid", "test"))
    val total = splits.values.sum
    assert(splits("train") > total * 5 / 10, s"train share off: $splits")
    assert(out.select("features").head().getSeq[Double](0).length == 3)
  }

  test("mm_decode_video section decodes an AVI payload from a spec") {
    val dir = java.nio.file.Files.createTempDirectory("mmvid").toString
    val avi = graft.Queries.aviRgb(8, 6, 4, (f, x, y) =>
      ((x + f) % 256, (y * 2) % 256, (x + y + f) % 256))
    Seq((1L, avi), (2L, "not avi".getBytes("UTF-8")))
      .toDF("video_id", "payload").write.parquet(s"$dir/in")
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$dir/in"}},
        {"id":"mm","name":"mm_decode_video","config":{"sample_every":"2"}}],
        "edges":[["src","mm"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      .orderBy("video_id").collect()
    assert(out(0).getInt(1) == 8 && out(0).getLong(3) == 4L &&
      out(0).getLong(4) == 2L)
    assert(out(1).getInt(1) == -1) // quarantined, not failed
  }

  test("text_analysis section appends narrow feature columns") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"ta","name":"text_analysis",
         "config":{"features":"lang,quality,tokens,fingerprint"}}],
        "edges":[["src","ta"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(Seq("pred_lang", "quality_score", "n_tokens", "fingerprint")
      .forall(out.columns.contains))
    // narrow: no shuffle in the plan
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    val r = out.select("quality_score", "n_tokens").head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0 && r.getLong(1) >= 0L)
  }

  test("pii_redact section strips emails from the text column") {
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    Seq((1L, "write to alice@example.com today"), (2L, "no pii here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$dir/in"}},
        {"id":"rx","name":"pii_redact","config":{"replacement":"<EMAIL>"}}],
        "edges":[["src","rx"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      .orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) == "write to <EMAIL> today")
    assert(out(1) == "no pii here")
  }

  test("sessionize section closes gap-based sessions from a spec") {
    val dir = java.nio.file.Files.createTempDirectory("sess_sec").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 10:10:00")),
        ("u1", ts("2024-01-01 12:00:00")), ("u2", ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts").write.parquet(s"$dir/in")
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$dir/in"}},
        {"id":"ss","name":"sessionize","config":{"gap_seconds":"1800"}}],
        "edges":[["src","ss"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(out == Set(
      ("u1", "2024-01-01 10:00:00.0", 2L),
      ("u1", "2024-01-01 12:00:00.0", 1L),
      ("u2", "2024-01-01 09:00:00.0", 1L)))
  }

  test("observe section attaches metrics without a second scan") {
    val dir = java.nio.file.Files.createTempDirectory("obs_sec").toString
    Seq((1, "a"), (2, null: String), (3, "c")).toDF("id", "v")
      .write.parquet(s"$dir/in")
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$dir/in"}},
        {"id":"ob","name":"observe","config":{"name":"tap","key_column":"v"}}],
        "edges":[["src","ob"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    // metrics land on the QueryExecution that actually ran — drive THIS
    // frame's execution, not a derived count() plan
    assert(out.collect().length == 3) // pass-through
    val metrics = out.queryExecution.observedMetrics.get("tap")
    assert(metrics.exists(r => r.getAs[Long]("rows") == 3L &&
      r.getAs[Long]("v_nulls") == 1L), s"metrics: $metrics")
  }

  test("dataset_split rejects degenerate percentages") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Transforms.splitColumn(
        org.apache.spark.sql.functions.col("id"), trainPct = 80, validPct = 30)
    }
    assert(e.getMessage.contains("sum to <= 100"))
  }

  test("dedup_exact section with deterministic tie-break") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_exact").toString
    Seq((1L, "a", "z"), (1L, "a", "y"), (2L, "b", "x"))
      .toDF("k", "g", "v").write.parquet(s"$dir/in")
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$dir/in"}},
        {"id":"dd","name":"dedup_exact","config":{"keys":"k","tie_break":"v"}}],
        "edges":[["src","dd"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "y"), (2L, "x")))
  }

  test("corpus-prep sections: decon, segment_dedup, pack, mix, bm25 from specs") {
    def run(section: String, config: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
          {"id":"op","name":"$section","config":{$config}}],
          "edges":[["src","op"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    }
    val decon = run("decon_overlap", """"bench_where":"doc_id % 7 = 0","ngram":"5"""")
    assert(decon.columns.toSeq == Seq("doc_id", "n_hits") && decon.count() > 0)

    // Bloom-prefiltered variant: exactly the same rows (no false negatives)
    val deconB = run("decon_bloom",
      """"bench_where":"doc_id % 7 = 0","ngram":"5","fpp":"0.01"""")
    assert(deconB.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      decon.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val seg = run("segment_dedup", """"seg_words":"8","max_df":"2"""")
    assert(seg.columns.toSeq == Seq("doc_id", "clean_text", "n_removed"))
    assert(seg.count() == spark.read.parquet(s"$sf/documents.parquet").count())

    val pack = run("pack_sequences", """"budget":"256"""")
    assert(pack.columns.toSeq == Seq("doc_id", "tok", "seq_id"))
    assert(pack.filter(org.apache.spark.sql.functions.col("seq_id") < 0).count() == 0)
    spark.catalog.clearCache()

    val packOff = run("pack_sequences", """"budget":"256","with_offsets":"true"""")
    assert(packOff.columns.toSeq == Seq("doc_id", "tok", "seq_id", "seq_pos"))
    assert(packOff.filter(
      org.apache.spark.sql.functions.col("seq_pos") >= 256).count() == 0)
    spark.catalog.clearCache()

    val mix = run("mix_weighted", """"rates":"en:1.0,de:0.0,es:0.0,fr:0.0,zh:0.0"""")
    assert(mix.columns.toSeq == Seq("doc_id", "lang"))
    assert(mix.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))

    val bm = run("bm25_topk", """"terms":"table,query","k":"5"""")
    assert(bm.columns.toSeq == Seq("doc_id", "score") && bm.count() == 5)

    val ch = run("chunk_tokens", """"window":"16","stride":"8"""")
    assert(ch.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk_text", "n_tokens"))
    assert(ch.count() >= spark.read.parquet(s"$sf/documents.parquet").count())

    val sm = run("sample_by_rate", """"rate":"least(1.0, n_chars / 400.0)"""")
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(sm.count() > 0 && sm.count() < total)

    val mtb = run("mix_token_budget", """"budgets":"en:500,de:300"""")
    assert(mtb.columns.toSeq == Seq("doc_id", "lang", "n_tokens"))
    val perLang = mtb.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // budgets are met-or-just-exceeded, and the budget table IS the
    // selection: es/fr/zh carry no budget and must be absent
    assert(perLang.keySet == Set("en", "de"), perLang.toString)
    assert(perLang("en") >= 500L && perLang("de") >= 300L)
    spark.catalog.clearCache()

    val mtbBad = intercept[Exception] {
      run("mix_token_budget", """"budgets":"en=500"""")
    }
    assert(mtbBad.getMessage.contains("domain:tokens"))
  }

  test("dedup_against section: reference_where splits, survivors out") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"dd","name":"dedup_against","config":{"reference_where":"doc_id % 3 = 0"}}],
        "edges":[["src","dd"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("doc_id"))
    val incoming = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 3 <> 0").count()
    val survivors = out.count()
    assert(survivors > 0 && survivors < incoming) // some dups dropped
    spark.catalog.clearCache()
  }

  test("dedup index sections: build, probe (index_path), absorb — " +
    "identical survivors to the inline split") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_sec").toString
    val build =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"ref","name":"sql","config":{"query":"SELECT * FROM input WHERE doc_id % 3 = 0"}},
        {"id":"ix","name":"dedup_index_destination","config":{"path":"$path"}}],
        "edges":[["src","ref"],["ref","ix"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(build))
    assert(new java.io.File(s"$path/sets").exists() &&
      new java.io.File(s"$path/bloom/current").exists())
    val probe =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"inc","name":"sql","config":{"query":"SELECT * FROM input WHERE doc_id % 3 <> 0"}},
        {"id":"dd","name":"dedup_against","config":{"index_path":"$path"}}],
        "edges":[["src","inc"],["inc","dd"]]}"""
    val viaIndex = PipelineCompiler
      .compileFrame(spark, PipelineSpec.fromJson(probe))
      .collect().map(_.getLong(0)).toSet
    val inline =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"dd","name":"dedup_against","config":{"reference_where":"doc_id % 3 = 0"}}],
        "edges":[["src","dd"]]}"""
    val viaInline = PipelineCompiler
      .compileFrame(spark, PipelineSpec.fromJson(inline))
      .collect().map(_.getLong(0)).toSet
    assert(viaIndex == viaInline && viaIndex.nonEmpty)
    spark.catalog.clearCache()
    // absorb the survivors through the destination section; their exact
    // duplicates are then dropped on a re-probe of the same slice
    val absorb =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"inc","name":"sql","config":{"query":"SELECT * FROM input WHERE doc_id % 3 <> 0"}},
        {"id":"ab","name":"dedup_index_absorb_destination","config":{"path":"$path"}}],
        "edges":[["src","inc"],["inc","ab"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(absorb))
    val reProbe = PipelineCompiler
      .compileFrame(spark, PipelineSpec.fromJson(probe)).count()
    assert(reProbe == 0, s"re-probe after absorb must drop everything, kept $reProbe")
    spark.catalog.clearCache()
  }

  test("dedup index absorb with compact_after: N daily runs keep every " +
    "bucket dir bounded without an explicit compact section") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_ca").toString
    PipelineCompiler.run(spark, PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"ref","name":"sql","config":{"query":"SELECT * FROM input WHERE doc_id % 7 = 0"}},
        {"id":"ix","name":"dedup_index_destination","config":{
          "path":"$path","exact_buckets":"2","band_buckets":"2","set_buckets":"2"}}],
        "edges":[["src","ref"],["ref","ix"]]}"""))
    // six daily absorbs through ONE self-maintaining spec (compact_after
    // 2): without it, each touched bucket dir would accrete ~one file
    // per absorb (7 by day six)
    (1 to 6).foreach { day =>
      PipelineCompiler.run(spark, PipelineSpec.fromJson(
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
          {"id":"inc","name":"sql","config":{"query":"SELECT * FROM input WHERE doc_id % 7 = $day"}},
          {"id":"ab","name":"dedup_index_absorb_destination","config":{
            "path":"$path","compact_after":"2"}}],
          "edges":[["src","inc"],["inc","ab"]]}"""))
    }
    for (t <- Seq("sets", "bands", "exact")) {
      val counts = new java.io.File(path, t).listFiles()
        .filter(d => d.isDirectory && d.getName.contains("="))
        .map(d => d.getName -> d.listFiles().count { f =>
          f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")
        }).toMap
      assert(counts.values.forall(_ <= 2),
        s"$t buckets must stay bounded by compact_after: $counts")
    }
    // the self-maintained store still answers: everything was absorbed,
    // so a full re-probe drops every document
    val kept = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"dd","name":"dedup_against","config":{"index_path":"$path"}}],
        "edges":[["src","dd"]]}""")).count()
    assert(kept == 0, s"re-probe after six absorbs kept $kept")
    spark.catalog.clearCache()
  }

  test("ann model sections: train+write via destination spec, serve from the store") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq_sec").toString
    val build =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"m","name":"ann_model_destination","config":{
          "path":"$path","k_centroids":"4","subspaces":"4","codes":"8",
          "cent_iters":"2","pq_iters":"2"}}],
        "edges":[["src","m"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(build))
    assert(new java.io.File(s"$path/cents").exists() &&
      new java.io.File(s"$path/codebooks").exists())
    val query =
      s"""{"sections":[
        {"id":"q","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"ann","name":"ann_model_query","config":{
          "path":"$path","k":"3","query_where":"vec_id < 4"}}],
        "edges":[["q","ann"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(query))
    assert(out.columns.contains("q_id") && out.columns.contains("rk"))
    assert(out.count() == 12) // 4 queries x k=3, served with no retrain
    spark.catalog.clearCache()
  }

  test("ann index sections: build via destination spec, query via transform spec") {
    val path = java.nio.file.Files.createTempDirectory("ivf_sec").toString
    val build =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"ix","name":"ann_index_destination","config":{
          "path":"$path","centroid_where":"vec_id < 16"}}],
        "edges":[["src","ix"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(build))
    assert(new java.io.File(s"$path/cells").exists())
    val query =
      s"""{"sections":[
        {"id":"q","name":"parquet_source","config":{"path":"$sf/embeddings.parquet"}},
        {"id":"f","name":"sql","config":{"query":"SELECT vec_id, embedding FROM input WHERE vec_id < 4"}},
        {"id":"ann","name":"ann_index_query","config":{"path":"$path","k":"3"}}],
        "edges":[["q","f"],["f","ann"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(query))
    assert(out.columns.toSeq == Seq("q_id", "n_id", "cosine", "rk"))
    assert(out.count() == 12) // 4 queries x k=3
  }

  test("mix_weighted section rejects malformed rates") {
    val e = intercept[IllegalArgumentException] {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
          {"id":"op","name":"mix_weighted","config":{"rates":"en=0.5"}}],
          "edges":[["src","op"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    }
    assert(e.getMessage.contains("domain:rate"))
  }

  test("dsir_weights section: per-doc log-ratio weights from a JSON spec") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"w","name":"dsir_weights","config":{
          "target":"lang = 'en'","buckets":"512"}}],
        "edges":[["src","w"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("doc_id", "n_feats", "dsir_logratio"))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == n, "one weight row per input document")
    // weights must discriminate: the english slice averages higher than the rest
    val byLang = out.join(spark.read.parquet(s"$sf/documents.parquet"), "doc_id")
      .groupBy("lang").agg(org.apache.spark.sql.functions.avg("dsir_logratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max,
      s"english target must outscore every other language on average: $byLang")
  }

  test("quality_classifier section: trained scores from a JSON spec") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"qc","name":"quality_classifier","config":{
          "positive":"lang = 'en'","buckets":"2048","iters":"2"}}],
        "edges":[["src","qc"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("doc_id", "quality_prob"))
    val byLang = out.join(spark.read.parquet(s"$sf/documents.parquet"), "doc_id")
      .groupBy("lang").agg(org.apache.spark.sql.functions.avg("quality_prob"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max,
      s"positive class must outscore the rest on average: $byLang")
  }

  test("dedup_lines and bigram_lm_score sections compile and run from JSON specs") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"dl","name":"dedup_lines","config":{}}],
        "edges":[["src","dl"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq ==
      Seq("doc_id", "clean_text", "lines_before", "lines_after"))
    assert(out.count() == spark.read.parquet(s"$sf/documents.parquet").count())
    val json2 =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"lm","name":"bigram_lm_score","config":{"vocab_size":"32"}}],
        "edges":[["src","lm"]]}"""
    val out2 = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json2))
    assert(out2.columns.toSeq ==
      Seq("doc_id", "n_tokens", "bigram_bits_per_token"))
    assert(out2.agg(org.apache.spark.sql.functions.max("bigram_bits_per_token"))
      .head().getDouble(0) > 0.0)
  }

  test("seeded_shuffle / curriculum / source_quota / tfidf_keywords sections run from JSON specs") {
    import org.apache.spark.sql.functions._
    def run(section: String, config: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
          {"id":"op","name":"$section","config":{$config}}],
          "edges":[["src","op"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()

    val sh = run("seeded_shuffle", """"seed":"e1"""")
    assert(sh.columns.toSeq == Seq("doc_id", "shuffle_key", "pos"))
    // positions are a permutation of 1..N, and a different seed permutes
    // differently (epochs decorrelate)
    assert(sh.agg(countDistinct("pos")).head().getLong(0) == total)
    assert(sh.agg(min("pos"), max("pos")).head() ==
      org.apache.spark.sql.Row(1L, total))
    val sh2 = run("seeded_shuffle", """"seed":"e2"""")
    val moved = sh.alias("a").join(sh2.alias("b"), "doc_id")
      .filter(col("a.pos") =!= col("b.pos")).count()
    assert(moved > total / 2, s"seed change moved only $moved of $total")

    val cu = run("curriculum", """"stages":"4"""")
    assert(cu.columns.toSeq == Seq("doc_id", "difficulty", "stage"))
    // exact-rank cut: 4 equal stage sizes, and stage never decreases as
    // difficulty increases
    val sizes = cu.groupBy("stage").count().orderBy("stage")
      .collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq.fill(4)(total / 4), s"stage sizes $sizes")
    val cross = cu.alias("a").join(cu.alias("b"),
      col("a.difficulty") < col("b.difficulty") &&
        col("a.stage") > col("b.stage")).count()
    assert(cross == 0, "a harder doc landed in an earlier stage")

    val qt = run("source_quota", """"k":"10"""")
    assert(qt.columns.toSeq == Seq("doc_id", "source", "q"))
    val perSource = qt.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 10))
    assert(perSource.length ==
      spark.read.parquet(s"$sf/documents.parquet")
        .select("source").distinct().count())

    val kw = run("tfidf_keywords", """"k":"3"""")
    assert(kw.columns.toSeq == Seq("doc_id", "token", "score"))
    assert(kw.groupBy("doc_id").count()
      .agg(max("count")).head().getLong(0) <= 3)
  }

  test("blocklist_screen and readability sections from JSON specs") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bl").toString
    Seq(
      (1L, "perfectly clean prose. easy to read!"),
      (2L, "contains the Forbidden word here"),
      (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp)
    def run(section: String, config: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$tmp"}},
          {"id":"op","name":"$section","config":{$config}}],
          "edges":[["src","op"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    }
    // flag mode appends the hit count; drop mode removes matches
    val flagged = run("blocklist_screen", """"terms":"forbidden,banned"""")
      .select("doc_id", "n_blocklist_hits").as[(Long, Long)].collect().toMap
    assert(flagged == Map(1L -> 0L, 2L -> 1L, 3L -> 0L), s"got $flagged")
    assert(run("blocklist_screen",
      """"terms":"forbidden","mode":"drop"""")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // readability: clean short-word prose scores high; empty text is null
    val fl = run("text_analysis", """"features":"readability"""")
      .select("doc_id", "flesch").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fl(3L).isEmpty, "empty doc must score null")
    assert(fl(1L).exists(_.asInstanceOf[Double] > 50.0),
      s"easy prose should score high, got ${fl(1L)}")
  }

  test("quantile_filter section: bottom decile dropped by exact percentile") {
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"qf","name":"quantile_filter","config":{"percentile":"0.1"}}],
        "edges":[["src","qf"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val kept = out.count()
    // >= because score ties at the threshold all survive
    assert(kept >= total * 85 / 100 && kept < total,
      s"kept $kept of $total — decile cut off")
    assert(out.columns.toSeq ==
      spark.read.parquet(s"$sf/documents.parquet").columns.toSeq,
      "filter must pass the schema through untouched")
    // explicit score expression variant
    val json2 =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"qf","name":"quantile_filter","config":{
          "percentile":"0.5","score":"n_chars"}}],
        "edges":[["src","qf"]]}"""
    val out2 = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json2))
    // ~half dropped (ties at the median may keep slightly more)
    assert(out2.count() <= total * 60 / 100, s"median cut kept ${out2.count()}")
  }

  test("dup_rank section: duplication-centrality from a JSON spec") {
    import org.apache.spark.sql.functions._
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"pr","name":"dup_rank","config":{"iters":"3"}}],
        "edges":[["src","pr"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
    assert(out.columns.toSeq == Seq("id", "rank"))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == total, "every document must carry a rank")
    // documents with near-dup neighbors outrank isolated ones
    assert(out.agg(countDistinct("rank")).head().getLong(0) > 1)
  }

  test("normalize_text section: NFC unifies composed/decomposed; accents, case, whitespace") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_norm").toString
    Seq(
      (1L, "caf\u00e9 table"),   // composed e-acute (U+00E9)
      (2L, "cafe\u0301 table"),  // decomposed e + combining acute
      (3L, "  CAF\u00c9   TABLE \t ")) // case + whitespace runs
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp)
    def run(cfg: String) = {
      val json =
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$tmp"}},
          {"id":"n","name":"normalize_text","config":{$cfg}}],
          "edges":[["src","n"]]}"""
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
        .orderBy("doc_id").select("text").as[String].collect().toSeq
    }
    // default chain: NFC + lower + collapse — all three spellings converge,
    // so every hash-based dedup upstream sees ONE document
    assert(run("") == Seq("caf\u00e9 table", "caf\u00e9 table", "caf\u00e9 table"))
    // accent stripping folds to pure ASCII
    assert(run(""""strip_accents":"true"""") ==
      Seq("cafe table", "cafe table", "cafe table"))
    // everything off = identity
    assert(run(""""nfc":"false","lowercase":"false","collapse_ws":"false"""")
      == Seq("caf\u00e9 table", "cafe\u0301 table", "  CAF\u00c9   TABLE \t "))
  }

  test("text_analysis compress_ratio: repetitive text compresses harder than varied text") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cr").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog while writing code"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp)
    val json =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$tmp"}},
        {"id":"ta","name":"text_analysis","config":{"features":"compress_ratio"}}],
        "edges":[["src","ta"]]}"""
    val out = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(json))
      .select("doc_id", "compress_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L),
      s"repetitive ratio ${out(1L)} should be below varied ${out(2L)}")
    assert(out.values.forall(r => r > 0.0 && r < 2.0))
  }
}
