package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM tokenizer's determinism contract: integer-cost Viterbi
  * with (max score, fewer pieces, longer final piece) tiebreaks, a
  * single-code-point <unk> floor, driver-local EM training that is a
  * pure function of the word dictionary, and train-once/serve-later
  * store parity. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def m(vocab: (String, Long)*): Unigram.Model =
    Unigram.model(vocab.toSeq)

  test("viterbi picks the max-score segmentation") {
    val model = m(("a", -100L), ("b", -200L), ("ab", -250L))
    // [ab] = -250 beats [a,b] = -300
    assert(Unigram.encodeCount("ab", model) == 1)
    assert(Unigram.segment("ab", model).toSeq == Seq("ab"))
    // "aab": [a,ab] = -350 beats [a,a,b] = -400
    assert(Unigram.segment("aab", model).toSeq == Seq("a", "ab"))
  }

  test("score tie breaks to fewer pieces") {
    val model = m(("a", -100L), ("b", -100L), ("ab", -200L))
    // [ab] and [a,b] both -200; one piece wins
    assert(Unigram.segment("ab", model).toSeq == Seq("ab"))
  }

  test("score+pieces tie breaks to the longer final piece") {
    val model = m(("a", -100L), ("b", -100L), ("ab", -100L), ("aa", -100L))
    // [aa,b] and [a,ab] both score -200 with 2 pieces; the smaller split
    // point (longer final piece "ab") wins
    assert(Unigram.segment("aab", model).toSeq == Seq("a", "ab"))
  }

  test("out-of-vocab code points score the <unk> floor, never throw") {
    val model = m(("a", -100L))
    assert(Unigram.encodeCount("axa", model) == 3)
    assert(Unigram.segment("axa", model).toSeq == Seq("a", "x", "a"))
    // a vocab piece above the unk floor displaces the per-cp unk path...
    val model2 = m(("a", -100L), ("xa", -20_000_000L))
    assert(Unigram.segment("axa", model2).toSeq == Seq("a", "xa"))
    // ...but a piece BELOW the floor loses to it — max score rules
    val model3 = m(("a", -100L), ("xa", -50_000_000L))
    assert(Unigram.segment("axa", model3).toSeq == Seq("a", "x", "a"))
  }

  test("tokenCount sums words; empty-safe") {
    val model = m(("a", -100L), ("b", -100L), ("ab", -100L))
    import org.apache.spark.unsafe.types.UTF8String
    assert(Unigram.tokenCount(UTF8String.fromString("  ab  a b "), model) == 3)
    assert(Unigram.tokenCount(UTF8String.fromString("   "), model) == 0)
    assert(Unigram.tokenCount(UTF8String.fromString(""), model) == 0)
  }

  test("trainLocal: full char coverage, bounded vocab, deterministic") {
    val dict = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 4L))
    val v1 = Unigram.trainLocal(dict, vocabSize = 14)
    val v2 = Unigram.trainLocal(dict.reverse, vocabSize = 14)
    assert(v1 == v2, "training must not depend on dictionary order")
    val chars = dict.flatMap(_._1.toCharArray).map(_.toString).distinct.toSet
    val pieces = v1.map(_._1).toSet
    assert(chars.subsetOf(pieces), "every corpus code point stays servable")
    assert(v1.size <= math.max(14, chars.size))
    assert(v1.map(_._1).distinct.size == v1.size)
    // trained model segments every dict word without the unk floor
    val model = Unigram.model(v1)
    dict.foreach { case (w, _) =>
      val segs = Unigram.segment(w, model)
      assert(segs.mkString == w)
      assert(segs.forall(pieces.contains))
    }
  }

  test("engine expression == driver twin over real documents") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vocab = graft.operators.Corpus.unigramTrain(docs, vocabSize = 60)
    val engine = graft.operators.Corpus.unigramTokenCounts(docs, vocab)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val model = Unigram.model(vocab)
    val local = docs.select(col("doc_id"), col("text"))
      .collect().map { r =>
        (r.getLong(0), Unigram.tokenCount(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
          model).toLong)
      }.sortBy(_._1).toSeq
    assert(engine == local)
  }

  test("viterbi == brute force over all segmentations (adversarial random models)") {
    // the DP's induced global order: max score, then fewest pieces, then
    // right-to-left lexicographically SMALLEST split points (the per-cell
    // smallest-j rule propagates recursively — last boundary first)
    def better(a: (Seq[String], Long, List[Int]),
               b: (Seq[String], Long, List[Int])): Boolean = {
      if (a._2 != b._2) a._2 > b._2
      else if (a._1.length != b._1.length) a._1.length < b._1.length
      else {
        val (ra, rb) = (a._3, b._3) // already reversed starts
        val cmp = ra.zip(rb).find { case (x, y) => x != y }
        cmp.forall { case (x, y) => x < y }
      }
    }
    val rnd = new scala.util.Random(20260815L)
    val alphabet = Array("a", "b", "c", "𝕒") // incl. an astral cp
    for (_ <- 1 to 400) {
      // random model over random pieces from the alphabet
      val nPieces = 2 + rnd.nextInt(6)
      val vocab = (Seq.tabulate(alphabet.length)(i => alphabet(i)) ++
        Seq.fill(nPieces) {
          (1 to (1 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }).distinct.map(p => (p, -100L - rnd.nextInt(2000).toLong))
      val model = Unigram.model(vocab)
      val word = (1 to (1 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // brute force with the full comparator
      val cps = word.codePoints.toArray.map(cp => new String(Character.toChars(cp)))
      val n = cps.length
      def segsFrom(from: Int): Seq[List[Int]] =
        if (from == n) Seq(Nil)
        else (from + 1 to n).flatMap { to =>
          val piece = cps.slice(from, to).mkString
          val ok = model.costs.containsKey(piece) || (to - from) == 1
          if (ok) segsFrom(to).map(from :: _) else Seq.empty
        }
      def cost(piece: String): Long = {
        val v = model.costs.get(piece)
        if (v != null) v.longValue() else Unigram.UnkMicroLogProb
      }
      val candidates = segsFrom(0).map { starts =>
        val bounds = starts.tail :+ n
        val pieces = starts.zip(bounds).map { case (a, b) =>
          cps.slice(a, b).mkString }
        (pieces.toSeq, pieces.map(cost).sum, starts.reverse)
      }
      val expected = candidates.reduceLeft((a, b) => if (better(b, a)) b else a)
      val got = Unigram.segment(word, model).toSeq
      assert(got == expected._1,
        s"word=$word vocab=${vocab.map(_._1)} got=$got expected=${expected._1}")
      assert(Unigram.encodeCount(word, model) == expected._1.length)
    }
  }

  test("engine == driver twin on adversarial random small-alphabet corpora") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42L)
    // tiny code-point alphabet + space => brutal duplication; the astral
    // cp exercises surrogate-pair handling end to end
    val alphabet = Array("a", "b", "𝕒", " ")
    val docsLocal = (1 to 120).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong,
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    import spark.implicits._
    val df = docsLocal.toDF("doc_id", "text")
    val vocab = graft.operators.Corpus.unigramTrain(df, vocabSize = 12)
    val model = Unigram.model(vocab)
    val engine = graft.operators.Corpus.unigramTokenCounts(df, vocab)
      .orderBy(col("doc_id")).collect().map(r => r.getLong(1)).toSeq
    val local = docsLocal.sortBy(_._1).map { case (_, t) =>
      Unigram.tokenCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), model).toLong }
    assert(engine == local)
  }

  test("unigramTrain: a binding maxDriverVocab truncates deterministically, still serves") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"alpha beta w$i w$i gamma"))
      .toDF("doc_id", "text")
    // budget 4 << distinct words: trains on the top-4 by (count desc,
    // word asc) — deterministic, and the result still encodes EVERYTHING
    // (chars of uncollected words fall to seeds from the kept top or unk)
    val bounded = graft.operators.Corpus.unigramTrain(docs, vocabSize = 10,
      maxDriverVocab = 4)
    val again = graft.operators.Corpus.unigramTrain(docs, vocabSize = 10,
      maxDriverVocab = 4)
    assert(bounded == again, "truncated training must be deterministic")
    assert(bounded.nonEmpty)
    val counts = graft.operators.Corpus.unigramTokenCounts(docs, bounded)
      .orderBy(col("doc_id")).collect().map(_.getLong(1))
    assert(counts.forall(_ > 0), "truncated model must still serve every doc")
  }

  test("token ids: piece-sorted index contract, unk = V, engine == driver twin") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vocab = graft.operators.Corpus.unigramTrain(docs, vocabSize = 60)
    // id space = piece-sorted index; stored models pin it forever
    val im = Unigram.idModel(vocab)
    vocab.map(_._1).zipWithIndex.foreach { case (p, i) =>
      assert(im.ids.get(p) == i)
    }
    assert(im.unkId == vocab.size)
    // unsorted vocab would silently renumber ids — must throw
    intercept[IllegalArgumentException] {
      Unigram.idModel(vocab.reverse)
    }
    // engine expression == segment-based driver twin
    val engine = graft.operators.Corpus.unigramTokenIds(docs, vocab)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSeq
    val model = Unigram.model(vocab)
    val pieceId = vocab.map(_._1).zipWithIndex.toMap
    val local = docs.select(col("doc_id"), col("text"))
      .collect().map { r =>
        val t = r.getString(1).trim
        val ids =
          if (t.isEmpty) List.empty[Int]
          else t.split("\\s+").toList.flatMap(w =>
            Unigram.segment(w, model).map(p =>
              pieceId.getOrElse(p, vocab.size)))
        (r.getLong(0), ids)
      }.sortBy(_._1).toSeq
    assert(engine == local)
    // counts equal sizes — the two surfaces agree
    val counts = graft.operators.Corpus.unigramTokenCounts(docs, vocab)
      .orderBy(col("doc_id")).collect().map(_.getLong(1)).toSeq
    assert(engine.map(_._2.length.toLong) == counts)
    // OOV single cp takes the reserved id
    val tiny = Unigram.idModel(Seq(("a", -100L)))
    val out = Unigram.encodeIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("aqa"), tiny)
    assert(out.toIntArray().toSeq == Seq(0, 1, 0))
  }

  test("unigram_encode section: vocab_path serving == inline; schema is array<int>") {
    import org.apache.spark.sql.functions.col
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val store = java.nio.file.Files.createTempDirectory("uni_ids")
      .toString + "/vocab"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Unigram.vocabWrite(
      graft.operators.Corpus.unigramTrain(docs, vocabSize = 60), store, spark)
    def json(extra: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"enc","name":"unigram_encode","config":{
          "vocab_size":"60"$extra}}],
        "edges":[["src","enc"]]}"""
    val served = PipelineCompiler.compileFrame(spark,
      PipelineSpec.fromJson(json(s""","vocab_path":"$store"""")))
    assert(served.schema("token_ids").dataType.simpleString == "array<int>")
    val a = served.orderBy(col("doc_id")).collect().toSeq
    val b = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(json("")))
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("packTokenIds: exact-budget sequences, boundary splits, stream == concat") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vocab = graft.operators.Corpus.unigramTrain(docs, vocabSize = 60)
    val budget = 64
    val packedRows = graft.operators.Corpus.packTokenIds(docs, vocab, budget)
      .orderBy(col("seq_id")).collect()
    val packed = packedRows
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSeq
    assert(packed.nonEmpty)
    // seq ids are contiguous from 0; every row but the last is EXACTLY
    // the budget; the last is the remainder
    assert(packed.map(_._1) == packed.indices.map(_.toLong))
    packed.init.foreach { case (sid, ids) =>
      assert(ids.length == budget, s"seq $sid has ${ids.length} tokens") }
    assert(packed.last._2.length <= budget && packed.last._2.nonEmpty)
    // the concatenated stream equals per-doc ids concatenated in doc_id
    // order — nothing lost, duplicated, or reordered by the splits
    val stream = packed.flatMap(_._2)
    val perDoc = graft.operators.Corpus.unigramTokenIds(docs, vocab)
      .orderBy(col("doc_id"))
      .collect().flatMap(_.getSeq[Int](1)).toList
    assert(stream == perDoc)
    // a doc longer than the budget must split across sequences: with
    // budget 64 and mean docs >> 64 tokens, interior boundaries hit
    // mid-doc — already proven by the stream equality; pin the shape too
    assert(stream.length / budget + 1 == packed.length ||
      stream.length % budget == 0 && stream.length / budget == packed.length)
    // doc_spans reconstruct the per-position doc attribution exactly:
    // expanding (start_k, doc_k) over [start_k, start_{k+1}) must equal
    // the doc labels implied by per-doc token counts in doc_id order
    val perDocIds = graft.operators.Corpus.unigramTokenIds(docs, vocab)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).length)).toSeq
    val expectedDocAt = perDocIds.flatMap { case (d, n) => Seq.fill(n)(d) }
    val gotDocAt = packedRows.flatMap { r =>
      val n = r.getSeq[Int](1).length
      val spans = r.getSeq[org.apache.spark.sql.Row](2)
        .map(s => (s.getInt(0), s.getLong(1)))
      assert(spans == spans.sortBy(_._1) && spans.head._1 == 0)
      spans.zipAll(spans.tail.map(_._1), (0, 0L), n).flatMap {
        case ((st, d), nx) => Seq.fill(nx - st)(d)
      }
    }.toSeq
    assert(gotDocAt == expectedDocAt)
  }

  test("packTokenIds leaves no cache pin behind (corpus ids are staged, not persisted)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vocab = graft.operators.Corpus.unigramTrain(docs, vocabSize = 60)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.operators.Corpus.packTokenIds(docs, vocab, budget = 64)
    assert(out.count() > 0)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"packTokenIds pinned ${added.size} RDD block set(s) in the cache " +
        "manager — the tokenized corpus must stage to disk, not persist")
  }

  test("pack_token_ids section: vocab_path serving == inline") {
    import org.apache.spark.sql.functions.col
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val store = java.nio.file.Files.createTempDirectory("uni_pack")
      .toString + "/vocab"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Unigram.vocabWrite(
      graft.operators.Corpus.unigramTrain(docs, vocabSize = 60), store, spark)
    def json(extra: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"pk","name":"pack_token_ids","config":{
          "budget":"64","vocab_size":"60"$extra}}],
        "edges":[["src","pk"]]}"""
    val a = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(json(s""","vocab_path":"$store"""")))
      .orderBy(col("seq_id")).collect().toSeq
    val b = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(json("")))
      .orderBy(col("seq_id")).collect().toSeq
    assert(a == b && a.nonEmpty)
    spark.catalog.clearCache() // drop the pack pass-1 persist (CorpusSpec discipline)
  }

  test("e2e spec DAG: train store -> pack under it -> parquet sink == direct API") {
    import org.apache.spark.sql.functions.col
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val dir = java.nio.file.Files.createTempDirectory("uni_e2e").toString
    // nightly job: train the tokenizer once, persist the model
    PipelineCompiler.run(spark, PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"m","name":"unigram_model_destination","config":{
          "path":"$dir/vocab","vocab_size":"60"}}],
        "edges":[["src","m"]]}"""))
    // corpus job: pack the corpus under the stored model, land parquet
    PipelineCompiler.run(spark, PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"pk","name":"pack_token_ids","config":{
          "budget":"64","vocab_path":"$dir/vocab"}},
        {"id":"out","name":"parquet_destination","config":{"path":"$dir/seqs"}}],
        "edges":[["src","pk"],["pk","out"]]}"""))
    val landed = spark.read.parquet(s"$dir/seqs")
      .orderBy(col("seq_id")).collect().toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val direct = graft.operators.Corpus.packTokenIds(docs,
        Unigram.vocabRead(spark, s"$dir/vocab"), budget = 64)
      .orderBy(col("seq_id")).collect().toSeq
    assert(landed == direct && landed.nonEmpty)
    spark.catalog.clearCache()
  }

  test("model store: round trip, duplicate pieces fail loudly") {
    val store = java.nio.file.Files.createTempDirectory("uni_store")
      .toString + "/vocab"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val trained = graft.operators.Corpus.unigramTrain(docs, vocabSize = 60)
    Unigram.vocabWrite(trained, store, spark)
    assert(Unigram.vocabRead(spark, store) == trained)

    val bad = java.nio.file.Files.createTempDirectory("uni_bad")
      .toString + "/vocab"
    import spark.implicits._
    Seq(("a", -1L), ("a", -2L)).toDF("piece", "micro_log_prob")
      .write.parquet(bad)
    val ex = intercept[IllegalArgumentException] {
      Unigram.vocabRead(spark, bad)
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("sections: model destination + vocab_path serving == inline training") {
    import org.apache.spark.sql.functions.col
    import graft.plans.{PipelineCompiler, PipelineSpec}
    val store = java.nio.file.Files.createTempDirectory("uni_sec")
      .toString + "/vocab"
    val trainJson =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"uni","name":"unigram_model_destination","config":{
          "path":"$store","vocab_size":"60"}}],
        "edges":[["src","uni"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(trainJson))
    def countJson(extra: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$sf/documents.parquet"}},
        {"id":"cnt","name":"unigram_token_count","config":{
          "vocab_size":"60"$extra}}],
        "edges":[["src","cnt"]]}"""
    val served = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(countJson(s""","vocab_path":"$store"""")))
      .orderBy(col("doc_id")).collect().toSeq
    val inline = PipelineCompiler.compileFrame(spark,
        PipelineSpec.fromJson(countJson("")))
      .orderBy(col("doc_id")).collect().toSeq
    assert(served == inline)
    assert(served.nonEmpty)
  }
}
