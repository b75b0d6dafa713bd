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

  // model-sized, loaded once per driver per path; serving queries hit the
  // cache on every re-plan (ConcurrentHashMap computeIfAbsent)
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]
  private val uniCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]

  private def bpeMerges(path: String): Seq[String] =
    bpeCache.computeIfAbsent(path,
      p => Bpe.mergesRead(SparkSession.active, p))
  private def uniVocab(path: String): Seq[(String, Long)] =
    uniCache.computeIfAbsent(path,
      p => Unigram.vocabRead(SparkSession.active, p))

  private val bpeIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Int)]]
  private def bpeVocabIds(path: String): Seq[(String, Int)] =
    bpeIdCache.computeIfAbsent(path,
      p => Bpe.vocabRead(SparkSession.active, p))

  /** visible for tests — serving stores are cached per path */
  private[graft] def cachedPaths: (Set[String], Set[String]) = {
    import scala.jdk.CollectionConverters._
    (bpeCache.keySet.asScala.toSet, uniCache.keySet.asScala.toSet)
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
        "merge store (path a literal; model cached per driver)", 2)(
      a => ex(BpeTokenCount(c(a.head),
        bpeMerges(litString("graft_bpe_tokens", a(1), "merges_path"))))),
    fd("graft_unigram_tokens",
      "graft_unigram_tokens(text, vocab_path) - unigram-LM (SentencePiece-" +
        "family) Viterbi token count under a trained vocab store (path a " +
        "literal; model cached per driver)", 2)(
      a => ex(UnigramTokenCount(c(a.head),
        uniVocab(litString("graft_unigram_tokens", a(1), "vocab_path"))))),
    fd("graft_bpe_ids",
      "graft_bpe_ids(text, merges_path, vocab_path) - BPE token-ID stream " +
        "(array<int>; HF vocab+merges id space, unk = V) under a stored " +
        "model (paths literals; cached per driver)", 3)(
      a => ex(BpeEncodeIds(c(a.head),
        bpeMerges(litString("graft_bpe_ids", a(1), "merges_path")),
        bpeVocabIds(litString("graft_bpe_ids", a(2), "vocab_path"))))),
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
