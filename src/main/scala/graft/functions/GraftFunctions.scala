package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** The engine's scalar surface as plain SQL functions — so `spark.sql`
  * users (notebooks, JDBC/Thrift clients, dbt-style tooling) can run the
  * text/vector/tokenizer battery without touching the Scala API:
  *
  * {{{
  *   GraftFunctions.register(spark)               // ad-hoc session
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *                                                // every cluster session
  *   SELECT graft_langid(text), graft_simhash(text),
  *          graft_unigram_tokens(text, '/lake/models/uni_vocab')
  *   FROM documents
  * }}}
  *
  * One builder list feeds BOTH paths, so ad-hoc and cluster-deployed
  * sessions resolve identically. Every function lowers to the same
  * codegen'd expressions the DataFrame API uses — a SQL call plans
  * exactly like its Scala twin (no UDF wrapping, no codegen break).
  *
  * The tokenizer functions SERVE trained stores: the path argument must
  * be a string literal, the model loads once per (driver, path) through
  * a cache, and rides into codegen as a reference object — the
  * train-once/serve-later loop, SQL-only.
  */
object GraftFunctions {

  private val TF = TextFunctions

  /** builder inputs arrive as raw catalyst expressions; Column-API
    * composition needs the one-hop bridge both ways. The output side must
    * FULLY convert (lambda-bearing compositions like simhash leave lazy
    * NullType stubs under the plain bridge and fail SQL analysis). */
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def ex(col: Column): Expression =
    ColumnBridge.expressionConverted(col)

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  /** literal-only arguments (k, n, model paths) — the model must be
    * known at plan time, not per row */
  private def litString(name: String, e: Expression, what: String): String =
    e match {
      case Literal(s: UTF8String, _) => s.toString
      case Literal(s: String, _) => s
      case other => throw new IllegalArgumentException(
        s"$name: $what must be a string literal, got $other")
    }

  private def litInt(name: String, e: Expression, what: String): Int =
    e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case Literal(v: Short, _) => v.toInt
      case Literal(v: Byte, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal, got $other")
    }

  // Serving-store caches: model-sized, loaded once per driver per (path,
  // content-fingerprint). Steady-state serving hits the cache on every
  // re-plan, but the nightly `graft tokenize` retrain that OVERWRITES a
  // store is picked up on the next query without a driver restart: the
  // fingerprint — the store directory's data-file listing as
  // name:length:mtime — changes when mergesWrite/vocabWrite rewrite the
  // part file, and a stale entry is replaced under the same map compute.
  private final case class Cached[A](fp: String, model: A)

  /** One LIST of the store directory per plan — cheap against the cost of
    * re-collecting the model, and valid for any Hadoop-visible scheme.
    *
    * STALENESS CONTRACT: the fingerprint is the top-level data files'
    * name:length:mtime — sufficient for SPARK-WRITTEN stores, the only
    * writers of this layout (`mergesWrite`/`vocabWrite` overwrite via
    * fresh task/part file NAMES, so a retrain always changes the
    * listing even if lengths collide and the filesystem's mtime is
    * coarse). A NON-Spark writer that rewrites a part file IN PLACE,
    * preserving name and length within the FS's mtime granularity (1 s
    * on some local filesystems; undefined on some object stores),
    * would serve the stale model until any of the three components
    * moves. If such writers ever exist, fold a content hash into the
    * store format (e.g. a _CHECKSUM sidecar the writer refreshes)
    * rather than hashing file bytes here — a per-plan full read of the
    * store defeats the cache's purpose. */
  private def storeFingerprint(path: String): String = {
    val spark = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.getName)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .mkString(";")
  }

  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Cached[Seq[String]]]
  private val uniCache =
    new java.util.concurrent.ConcurrentHashMap[String, Cached[Seq[(String, Long)]]]
  // the (merges, vocab) PAIR is ONE cache entry keyed on both paths and
  // loaded under one compute: version-A merges can never be paired with
  // version-B vocab even when a retrain lands between two plans
  private val bpePairCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Cached[(Seq[String], Seq[(String, Int)])]]

  private def bpeMerges(path: String): Seq[String] = {
    val fp = storeFingerprint(path)
    bpeCache.compute(path, (p, old) =>
      if (old != null && old.fp == fp) old
      else Cached(fp, Bpe.mergesRead(SparkSession.active, p))).model
  }
  private def uniVocab(path: String): Seq[(String, Long)] = {
    val fp = storeFingerprint(path)
    uniCache.compute(path, (p, old) =>
      if (old != null && old.fp == fp) old
      else Cached(fp, Unigram.vocabRead(SparkSession.active, p))).model
  }
  private def bpePair(mergesPath: String, vocabPath: String)
      : (Seq[String], Seq[(String, Int)]) = {
    val fp = storeFingerprint(mergesPath) + "|" + storeFingerprint(vocabPath)
    bpePairCache.compute((mergesPath, vocabPath), (k, old) =>
      if (old != null && old.fp == fp) old
      else {
        val spark = SparkSession.active
        val merges = Bpe.mergesRead(spark, k._1)
        val vocab = Bpe.vocabRead(spark, k._2)
        Bpe.requireCompanion(merges, vocab, k._1, k._2)
        Cached(fp, (merges, vocab))
      }).model
  }

  /** visible for tests — serving stores are cached per path */
  private[graft] def cachedPaths: (Set[String], Set[String]) = {
    import scala.jdk.CollectionConverters._
    (bpeCache.keySet.asScala.toSet ++
       bpePairCache.keySet.asScala.map(_._1),
      uniCache.keySet.asScala.toSet)
  }

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fd(name: String, usage: String, n: Int)(
      f: Seq[Expression] => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getCanonicalName,
        null, name, usage, ""),
      arity(name, n)(f))

  /** The catalog. Names are `graft_`-prefixed to stay clear of builtins. */
  val functions: Seq[FunctionDescription] = Seq(
    fd("graft_hash60",
      "graft_hash60(s) - 60-bit md5-derived hash (the dedup family's key hash)", 1)(
      a => ex(TF.hash60(c(a.head)))),
    fd("graft_tokens",
      "graft_tokens(text) - whitespace tokens, trim + \\s+, empty-safe", 1)(
      a => ex(TF.tokens(c(a.head)))),
    fd("graft_token_count",
      "graft_token_count(text) - whitespace token count", 1)(
      a => ex(TF.tokenCount(c(a.head)))),
    fd("graft_token_count_bpeish",
      "graft_token_count_bpeish(text) - fast BPE-ish subword token estimate", 1)(
      a => ex(TF.tokenCountBpeIsh(c(a.head)))),
    fd("graft_char_shingles",
      "graft_char_shingles(text, k) - character k-shingles (k a literal)", 2)(
      a => ex(TF.charShingles(c(a.head),
        litInt("graft_char_shingles", a(1), "k")))),
    fd("graft_word_ngrams",
      "graft_word_ngrams(text, n) - word n-grams (n a literal)", 2)(
      a => ex(TF.wordNgrams(c(a.head),
        litInt("graft_word_ngrams", a(1), "n")))),
    fd("graft_simhash",
      "graft_simhash(text) - 60-bit simhash over whitespace tokens", 1)(
      a => ex(TF.simhash(TF.tokens(c(a.head))))),
    fd("graft_hamming",
      "graft_hamming(a, b) - hamming distance between two hash longs", 2)(
      a => ex(TF.hammingDistance(c(a.head), c(a(1))))),
    fd("graft_fingerprint",
      "graft_fingerprint(text) - rolling polynomial document fingerprint", 1)(
      a => ex(TF.fingerprint(TF.tokens(c(a.head))))),
    fd("graft_langid",
      "graft_langid(text) - stopword-profile language id (en/de/fr/es/unknown)", 1)(
      a => ex(TF.languageId(c(a.head)))),
    fd("graft_quality",
      "graft_quality(text) - quality feature struct (length/punct/stopword/score)", 1)(
      a => ex(TF.qualityFeatures(c(a.head)))),
    fd("graft_gopher_rules",
      "graft_gopher_rules(text) - Gopher rule battery as a boolean struct", 1)(
      a => ex(TF.gopherRules(c(a.head)))),
    fd("graft_normalize_text",
      "graft_normalize_text(text) - NFC + whitespace/control normalization", 1)(
      a => ex(TF.normalizeText(c(a.head)))),
    fd("graft_deflate_length",
      "graft_deflate_length(s) - deflate-compressed length (compressibility signal)", 1)(
      a => ex(DeflateLength(c(a.head)))),
    fd("graft_dot",
      "graft_dot(a, b) - dot product of two double arrays", 2)(
      a => ex(VectorFunctions.dot(c(a.head), c(a(1))))),
    fd("graft_cosine",
      "graft_cosine(a, b) - cosine similarity, zero-norm-safe (round-6 contract)", 2)(
      a => ex(VectorFunctions.cosine(c(a.head), c(a(1))))),
    fd("graft_bpe_tokens",
      "graft_bpe_tokens(text, merges_path) - BPE token count under a trained " +
        "merge store (path a literal; model cached per store fingerprint " +
        "- a retrain over the same path serves fresh)", 2)(
      a => ex(BpeTokenCount(c(a.head),
        bpeMerges(litString("graft_bpe_tokens", a(1), "merges_path"))))),
    fd("graft_unigram_tokens",
      "graft_unigram_tokens(text, vocab_path) - unigram-LM (SentencePiece-" +
        "family) Viterbi token count under a trained vocab store (path a " +
        "literal; model cached per store fingerprint)", 2)(
      a => ex(UnigramTokenCount(c(a.head),
        uniVocab(litString("graft_unigram_tokens", a(1), "vocab_path"))))),
    fd("graft_bpe_ids",
      "graft_bpe_ids(text, merges_path, vocab_path) - BPE token-ID stream " +
        "(array<int>; HF vocab+merges id space, unk = V) under a stored " +
        "model (paths literals; merges+vocab cached as ONE fingerprinted " +
        "unit - mismatched stores refuse at load)", 3)(
      a => {
        val (merges, vocab) = bpePair(
          litString("graft_bpe_ids", a(1), "merges_path"),
          litString("graft_bpe_ids", a(2), "vocab_path"))
        ex(BpeEncodeIds(c(a.head), merges, vocab))
      }),
    fd("graft_unigram_ids",
      "graft_unigram_ids(text, vocab_path) - unigram-LM token-ID stream " +
        "(array<int>; ids = piece-sorted vocab index, unk = V) under a " +
        "trained vocab store", 2)(
      a => ex(UnigramEncodeIds(c(a.head),
        uniVocab(litString("graft_unigram_ids", a(1), "vocab_path")))))
  )

  /** Ad-hoc registration on a live session (the extension-less path). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
