package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function catalog: every `graft_*` function must plan to the
  * SAME expressions as its Scala twin (value parity over real documents),
  * literal-argument misuse must fail loudly at plan time, the serving
  * tokenizers must load their stores once per path, and the
  * `spark.sql.extensions=graft.GraftExtensions` deploy path must register
  * the identical catalog. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  private val sf = TestSpark.sf

  private def docs = {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    d.createOrReplaceTempView("documents")
    d
  }

  test("scalar functions: SQL == Column API over real documents") {
    val d = docs
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS n,
           graft_simhash(text) AS sh, graft_langid(text) AS lang,
           graft_fingerprint(text) AS fp,
           graft_hamming(graft_simhash(text), graft_hash60(text)) AS hd,
           graft_normalize_text(text) AS norm,
           graft_deflate_length(text) AS dl
         FROM documents ORDER BY doc_id""").collect().toSeq
    val tf = TextFunctions
    val viaApi = d.select(col("doc_id"),
        tf.tokenCount(col("text")).as("n"),
        tf.simhash(tf.tokens(col("text"))).as("sh"),
        tf.languageId(col("text")).as("lang"),
        tf.fingerprint(tf.tokens(col("text"))).as("fp"),
        tf.hammingDistance(tf.simhash(tf.tokens(col("text"))),
          tf.hash60(col("text"))).as("hd"),
        tf.normalizeText(col("text")).as("norm"),
        DeflateLength(col("text")).as("dl"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("struct + literal-arg functions parse and agree") {
    docs
    val rows = spark.sql(
      """SELECT graft_quality(text).quality_score AS q,
           graft_gopher_rules(text), graft_char_shingles(text, 5) AS sh5,
           size(graft_word_ngrams(text, 3)) AS n3,
           graft_tokens(text) AS ts,
           graft_token_count_bpeish(text) AS nb
         FROM documents LIMIT 5""").collect()
    assert(rows.length == 5)
  }

  test("vector functions agree with VectorFunctions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    emb.createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_dot(v, v) AS d, graft_cosine(v, v) AS c
         FROM emb_sql ORDER BY vec_id LIMIT 20""").collect().toSeq
    val viaApi = emb.select(col("vec_id"),
        VectorFunctions.dot(col("v"), col("v")).as("d"),
        VectorFunctions.cosine(col("v"), col("v")).as("c"))
      .orderBy(col("vec_id")).limit(20).collect().toSeq
    assert(viaSql == viaApi)
  }

  test("serving tokenizers: store-backed SQL == Scala serving; cached per path") {
    val d = docs
    val dir = java.nio.file.Files.createTempDirectory("graft_fn").toString
    val uniStore = s"$dir/uni"
    val bpeStore = s"$dir/bpe"
    val vocab = graft.operators.Corpus.unigramTrain(d, vocabSize = 60)
    Unigram.vocabWrite(vocab, uniStore, spark)
    val merges = graft.operators.Corpus.bpeTrain(d, maxMerges = 40)
    Bpe.mergesWrite(merges, bpeStore, spark)
    val bpeIdsStore = s"$dir/bpe_ids"
    val bpeVocab = Bpe.vocabFromMerges(merges,
      graft.operators.Corpus.bpeAlphabet(d))
    Bpe.vocabWrite(bpeVocab, bpeIdsStore, spark)

    val viaSql = spark.sql(
      s"""SELECT doc_id, graft_unigram_tokens(text, '$uniStore') AS u,
            graft_bpe_tokens(text, '$bpeStore') AS b,
            graft_unigram_ids(text, '$uniStore') AS ui,
            graft_bpe_ids(text, '$bpeStore', '$bpeIdsStore') AS bi
          FROM documents ORDER BY doc_id""").collect().toSeq
    val viaApi = d.select(col("doc_id"),
        UnigramTokenCount(col("text"), vocab).as("u"),
        BpeTokenCount(col("text"), merges).as("b"),
        UnigramEncodeIds(col("text"), vocab).as("ui"),
        BpeEncodeIds(col("text"), merges, bpeVocab).as("bi"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(viaSql == viaApi)

    // second query re-plans against the cache, not the store
    spark.sql(s"SELECT graft_unigram_tokens(text, '$uniStore') FROM documents")
      .collect()
    val (bpePaths, uniPaths) = GraftFunctions.cachedPaths
    assert(uniPaths.contains(uniStore) && bpePaths.contains(bpeStore))
  }

  test("retrain over the same store path is served without a restart") {
    val d = docs
    val dir = java.nio.file.Files.createTempDirectory("graft_fn_rt").toString
    val store = s"$dir/bpe"
    val vocabStore = s"$dir/bpe_vocab"
    val alphabet = graft.operators.Corpus.bpeAlphabet(d)

    // v1: tiny model, serve once (populates the caches)
    val m1 = graft.operators.Corpus.bpeTrain(d, maxMerges = 5)
    Bpe.mergesWrite(m1, store, spark)
    Bpe.vocabWrite(Bpe.vocabFromMerges(m1, alphabet), vocabStore, spark)
    val r1 = spark.sql(
      s"""SELECT sum(graft_bpe_tokens(text, '$store')) AS n,
            sum(size(graft_bpe_ids(text, '$store', '$vocabStore'))) AS ni
          FROM documents""").collect().head

    // v2: deeper model OVERWRITES the same paths — the nightly `graft
    // tokenize` deploy shape; next query must serve v2 (fewer tokens)
    val m2 = graft.operators.Corpus.bpeTrain(d, maxMerges = 40)
    assert(m2.length > m1.length)
    Bpe.mergesWrite(m2, store, spark)
    Bpe.vocabWrite(Bpe.vocabFromMerges(m2, alphabet), vocabStore, spark)
    val r2 = spark.sql(
      s"""SELECT sum(graft_bpe_tokens(text, '$store')) AS n,
            sum(size(graft_bpe_ids(text, '$store', '$vocabStore'))) AS ni
          FROM documents""").collect().head
    assert(r2.getLong(0) < r1.getLong(0),
      s"retrained (deeper) model must merge more: v1=${r1.getLong(0)} v2=${r2.getLong(0)}")
    // the id stream and the token count must come from the SAME model
    assert(r1.getLong(0) == r1.getLong(1) && r2.getLong(0) == r2.getLong(1))

    // unigram twin: retrain over the same vocab path is picked up too
    val uniStore = s"$dir/uni"
    Unigram.vocabWrite(
      graft.operators.Corpus.unigramTrain(d, vocabSize = 30), uniStore, spark)
    val u1 = spark.sql(
      s"SELECT sum(graft_unigram_tokens(text, '$uniStore')) FROM documents")
      .collect().head.getLong(0)
    Unigram.vocabWrite(
      graft.operators.Corpus.unigramTrain(d, vocabSize = 120), uniStore, spark)
    val u2 = spark.sql(
      s"SELECT sum(graft_unigram_tokens(text, '$uniStore')) FROM documents")
      .collect().head.getLong(0)
    assert(u2 < u1,
      s"bigger unigram vocab must tokenize shorter: v1=$u1 v2=$u2")
  }

  test("mismatched merges/vocab stores fail loudly at load") {
    val d = docs
    val dir = java.nio.file.Files.createTempDirectory("graft_fn_mm").toString
    val alphabet = graft.operators.Corpus.bpeAlphabet(d)
    val mA = graft.operators.Corpus.bpeTrain(d, maxMerges = 40)
    Bpe.mergesWrite(mA, s"$dir/mergesA", spark)
    // a vocab from a DIFFERENT (shallower) training run: missing the
    // deeper merge products — pairing it with mergesA would silently
    // send those pieces to <unk>
    val mB = mA.take(2)
    Bpe.vocabWrite(Bpe.vocabFromMerges(mB, alphabet), s"$dir/vocabB", spark)
    val e = intercept[Exception] {
      spark.sql(s"""SELECT graft_bpe_ids(text, '$dir/mergesA',
          '$dir/vocabB') FROM documents""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not the companion")),
      s"expected companion failure, got: ${msgs(e).mkString(" | ")}")
    // the pipeline-section path rejects the same mismatch
    val e2 = intercept[Exception] {
      graft.functions.Bpe.requireCompanion(
        graft.functions.Bpe.mergesRead(spark, s"$dir/mergesA"),
        graft.functions.Bpe.vocabRead(spark, s"$dir/vocabB"),
        s"$dir/mergesA", s"$dir/vocabB")
    }
    assert(e2.getMessage.contains("not the companion"))
  }

  test("literal-argument misuse fails loudly at plan time") {
    docs
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_unigram_tokens(text, doc_id) FROM documents")
        .collect()
    }
    assert(e1.getMessage.contains("string literal") ||
      e1.getCause != null &&
        e1.getCause.getMessage.contains("string literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_char_shingles(text, text) FROM documents")
        .collect()
    }
    assert(e2.getMessage.contains("integer literal") ||
      e2.getCause != null &&
        e2.getCause.getMessage.contains("integer literal"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_langid(text, text) FROM documents").collect()
    }
    assert(e3.getMessage.contains("argument") ||
      e3.getCause != null && e3.getCause.getMessage.contains("argument"))
  }

  test("extension deploy path registers the same catalog") {
    import org.apache.spark.sql.SparkSession
    val shared = spark // force the shared session/context to exist first
    // getOrCreate only BUILDS (and applies extensions) when no default
    // session exists — clear, build a fresh session on the SAME context,
    // restore after. Per-session function registries keep the catalogs
    // independent, so this genuinely exercises the injectFunction path.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions (not the conf): spark.sql.extensions is a STATIC
      // conf read from the CONTEXT at build, so it can't attach to a new
      // session on a reused context — withExtensions applies either way
      // and runs the same GraftExtensions.apply the conf path runs
      val s2 = SparkSession.builder()
        .master(shared.sparkContext.master)
        .withExtensions(new graft.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne shared, "extension test needs a fresh session")
      val d = s2.read.parquet(s"$sf/documents.parquet")
      d.createOrReplaceTempView("docs_ext")
      val viaExt = s2.sql(
        "SELECT doc_id, graft_token_count(text) AS n FROM docs_ext ORDER BY doc_id")
        .collect().toSeq
      val viaApi = d.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n"))
        .orderBy(col("doc_id")).collect().toSeq
      assert(viaExt == viaApi && viaExt.nonEmpty)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
