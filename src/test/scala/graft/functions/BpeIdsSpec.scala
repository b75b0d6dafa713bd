package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The BPE token-ID surface: HF's vocab+merges id space (alphabet first,
  * merge outputs in rank order, first assignment wins on collisions),
  * engine == driver twin, loud failures on broken models, store parity
  * through the bpe_encode section. */
class BpeIdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("vocabFromMerges: alphabet first, rank order, collision keeps first id") {
    val merges = Seq("a b", "ab c", "a bc", "b c")
    // "ab c" and "a bc" both concatenate to "abc" — first (lower rank) wins
    val vocab = Bpe.vocabFromMerges(merges, Seq("a", "b", "c"))
    assert(vocab == Seq(("a", 0), ("b", 1), ("c", 2),
      ("ab", 3), ("abc", 4), ("bc", 5)))
    intercept[IllegalArgumentException] {
      Bpe.vocabFromMerges(merges, Seq("a", "a"))
    }
  }

  test("idModel rejects gaps and duplicates loudly") {
    intercept[IllegalArgumentException] {
      Bpe.idModel(Seq.empty, Seq(("a", 0), ("b", 2)))
    }
    intercept[IllegalArgumentException] {
      Bpe.idModel(Seq.empty, Seq(("a", 0), ("a", 1)))
    }
  }

  test("engine expression == driver twin over real documents; counts == sizes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = graft.operators.Corpus.bpeTrain(docs, maxMerges = 40)
    val alphabet = graft.operators.Corpus.bpeAlphabet(docs)
    // the alphabet is code-point sorted and duplicate-free
    assert(alphabet.sliding(2).forall {
      case Seq(a, b) => Bpe.codePointCompare(a, b) < 0
      case _ => true
    })
    val vocab = Bpe.vocabFromMerges(merges, alphabet)
    val engine = graft.operators.Corpus.bpeTokenIds(docs, merges, vocab)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSeq
    val ranks = Bpe.rankMap(merges)
    val pieceId = vocab.toMap
    val local = docs.select(col("doc_id"), col("text"))
      .collect().map { r =>
        val t = r.getString(1).trim
        val ids =
          if (t.isEmpty) List.empty[Int]
          else t.split("\\s+").toList.flatMap(w =>
            Bpe.encodeWord(w, ranks).map(p =>
              pieceId.getOrElse(p, vocab.size)))
        (r.getLong(0), ids)
      }.sortBy(_._1).toSeq
    assert(engine == local)
    // the training alphabet covers the corpus: no unk on the train set
    assert(engine.forall(_._2.forall(_ < vocab.size)))
    val counts = graft.operators.Corpus.bpeTokenCounts(docs, merges)
      .orderBy(col("doc_id")).collect().map(_.getLong(1)).toSeq
    assert(engine.map(_._2.length.toLong) == counts)
  }

  test("BpeMergesApply: 64-merge window == sequential folds, inside codegen") {
    import org.apache.spark.sql.functions.{col, expr}
    // 64 synthetic merges over a digit alphabet: "0 1"->"01", "01 2"->
    // "012", ... — each rank extends the previous product, so ORDER
    // matters and any reordering/skip changes the result
    val merges = (1 until 65).map(i =>
      ((0 until i).map(_ % 10).mkString, (i % 10).toString))
    // input built from codegen-capable split() — a higher-order function
    // here would itself evict the Project from codegen and mask the check
    val digits = (0 until 80).map(_ % 10).mkString(",")
    val docs = spark.range(200).selectExpr(
      s"split('$digits', ',') AS parts")
    val wide = docs.select(
      BpeMergesApply(col("parts"), merges).as("out"))
    val folded = docs.select(
      merges.foldLeft(col("parts")) { case (c, (l, r)) =>
        BpeMergeApply(c, l, r)
      }.as("out"))
    assert(wide.collect().toSeq == folded.collect().toSeq)
    // the wide window must stay INSIDE whole-stage codegen: with
    // fallback disabled a Janino failure would throw instead of
    // silently interpreting
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val plan = wide.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"wide merge window fell out of codegen (no starred Project):\n$plan")
      assert(wide.count() == 200)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
    // and bpeTrain's distributed path (maxDriverVocab = 0 forces it)
    // agrees with the driver-local trainer over real documents
    val real = spark.read.parquet(s"$sf/documents.parquet").limit(120)
    val distributed = graft.operators.Corpus.bpeTrain(real, maxMerges = 24,
      maxDriverVocab = 0)
    val local = graft.operators.Corpus.bpeTrain(real, maxMerges = 24)
    assert(distributed == local,
      s"window-batched distributed training diverged:\n$distributed\nvs\n$local")
  }

  test("out-of-alphabet code points take the reserved id") {
    val vocab = Bpe.vocabFromMerges(Seq("a b"), Seq("a", "b"))
    val im = Bpe.idModel(Seq("a b"), vocab)
    val out = Bpe.encodeIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab qa"), im)
    // "ab" merges -> id 2; "qa" -> q unknown (id 3 = V), a -> 0
    assert(out.toIntArray().toSeq == Seq(2, 3, 0))
  }

  test("packBpeTokenIds: stream == per-doc concat; section tokenizer=bpe matches") {
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = graft.operators.Corpus.bpeTrain(docs, maxMerges = 40)
    val vocab = Bpe.vocabFromMerges(merges,
      graft.operators.Corpus.bpeAlphabet(docs))
    val budget = 64
    val packed = graft.operators.Corpus
      .packBpeTokenIds(docs, merges, vocab, budget)
      .orderBy(col("seq_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSeq
    packed.init.foreach { case (_, ids) => assert(ids.length == budget) }
    val stream = packed.flatMap(_._2)
    val perDoc = graft.operators.Corpus.bpeTokenIds(docs, merges, vocab)
      .orderBy(col("doc_id")).collect().flatMap(_.getSeq[Int](1)).toList
    assert(stream == perDoc)
    val viaSection = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(
        s"""{"sections":[
          {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
          {"id":"pk","name":"pack_token_ids","config":{
            "tokenizer":"bpe","budget":"64","max_merges":"40"}}],
          "edges":[["src","pk"]]}"""))
      .orderBy(col("seq_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSeq
    assert(viaSection == packed)
    spark.catalog.clearCache() // drop the pack pass-1 persist (CorpusSpec discipline)
  }

  test("bpe_encode section: stored model == inline; half model refused") {
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val dir = java.nio.file.Files.createTempDirectory("bpe_ids").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // train + write BOTH stores via the destination section
    val trainJson =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"m","name":"bpe_model_destination","config":{
          "path":"$dir/merges","ids_path":"$dir/vocab","max_merges":"40"}}],
        "edges":[["src","m"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(trainJson))
    def encJson(extra: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"e","name":"bpe_encode","config":{"max_merges":"40"$extra}}],
        "edges":[["src","e"]]}"""
    val served = PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(
        encJson(s""","merges_path":"$dir/merges","vocab_path":"$dir/vocab"""")))
      .orderBy(col("doc_id")).collect().toSeq
    val inline = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(encJson("")))
      .orderBy(col("doc_id")).collect().toSeq
    assert(served == inline && served.nonEmpty)
    val ex = intercept[Exception] {
      PipelineCompiler.compileFrame(spark, PipelineSpec.fromJson(
        encJson(s""","merges_path":"$dir/merges"""")))
    }
    assert(ex.getMessage.contains("BOTH") ||
      ex.getCause != null && ex.getCause.getMessage.contains("BOTH"))
  }
}
