package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer ENCODE (the SentencePiece-family counterpart of
  * [[BpeTokenCount]] — Kudo 2018, "Subword Regularization"): each
  * whitespace word is segmented by VITERBI under a trained piece→log-prob
  * model — the segmentation maximizing the summed piece log-probs — and
  * the expression returns the total piece count of the text.
  *
  * Determinism contract (what makes this exactly replayable as a
  * recursive SQL DP, the same discipline as the BPE oracle):
  *  - scores are INTEGER micro-log-probs (`round(ln p · 1e6)` longs), so
  *    DP sums are exact in every engine — no float-order divergence;
  *  - ties break by FEWER pieces, then by the LONGER final piece
  *    (smaller split point), applied at every DP cell;
  *  - pieces are code-point substrings; a single code point absent from
  *    the vocab scores [[Unigram.UnkMicroLogProb]] (the <unk> floor), so
  *    every position is reachable and serving never throws on unseen
  *    characters.
  *
  * The model rides into generated code as a reference object, keeping the
  * encode inside WholeStageCodegen — a per-row narrow op over the full
  * corpus, like the other tokenizer expressions.
  */
case class UnigramTokenCount(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  @transient private lazy val model = Unigram.model(vocab)

  override def nullSafeEval(v: Any): Any =
    Unigram.tokenCount(v.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // binary name — janino resolves `Unigram$Model` as a plain class
    // identifier; the dotted Scala path would not parse as Java
    val ref = ctx.addReferenceObj("unigramModel", model,
      "graft.functions.Unigram$Model")
    defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.tokenCount($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramTokenCount {
  def apply(c: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramTokenCount(ColumnBridge.expression(c), vocab))
}

/** Unigram-LM ENCODE to TOKEN IDS — the trainer-consumable output (what a
  * 100 TB tokenization job actually exports): the same Viterbi
  * segmentation as [[UnigramTokenCount]], each piece mapped to its id.
  *
  * Id contract (SentencePiece's shape — the model file IS the id space):
  * id(piece) = index of the piece in the PIECE-SORTED vocab (0..V−1 —
  * [[Unigram.trainLocal]] and [[Unigram.vocabRead]] both emit that
  * order, so a stored model defines stable ids forever), and every
  * out-of-vocab single code point gets the reserved id V (`<unk>`). Ids
  * are contiguous, deterministic, and independent of the corpus being
  * encoded. Words concatenate in order; whitespace itself is not a
  * token (the [[Unigram.tokenCount]] contract — counts equal
  * `size(ids)`). */
case class UnigramEncodeIds(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  @transient private lazy val model = Unigram.idModel(vocab)

  override def nullSafeEval(v: Any): Any =
    Unigram.encodeIds(v.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramIdModel", model,
      "graft.functions.Unigram$IdModel")
    defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.encodeIds($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramEncodeIds {
  def apply(c: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramEncodeIds(ColumnBridge.expression(c), vocab))
}

object Unigram {

  /** Max piece length (code points) the trainer proposes — SentencePiece's
    * `max_sentencepiece_length` posture (its default is 16; 8 covers
    * realistic subwords and quarters the seed-substring work). */
  val MaxPieceLen = 8

  /** Micro-log-prob of an out-of-vocab single code point — `ln(1e-12)·1e6`,
    * far below any trained piece, so <unk> is only ever chosen when no
    * vocab piece covers the character. A CONSTANT (not data-derived) so
    * oracles inject one literal. */
  val UnkMicroLogProb: Long = -27631021L

  /** Serving-side model: piece → micro-log-prob plus the max piece length
    * actually present (bounds the DP inner loop). Public and
    * janino-visible — codegen references it by name. */
  final class Model(val costs: java.util.HashMap[String, java.lang.Long],
                    val maxLen: Int) extends Serializable

  def model(vocab: Seq[(String, Long)]): Model = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    var maxLen = 1
    vocab.foreach { case (p, mlp) =>
      require(p.nonEmpty, "empty piece in unigram vocab")
      m.put(p, mlp)
      maxLen = math.max(maxLen, p.codePointCount(0, p.length))
    }
    new Model(m, maxLen)
  }

  /** Serving-side ID model: the cost [[Model]] plus piece→id (index in
    * the piece-sorted vocab) and the reserved `<unk>` id V. Public and
    * janino-visible — codegen references it by name. */
  final class IdModel(val model: Model,
                      val ids: java.util.HashMap[String, Integer],
                      val unkId: Int) extends Serializable

  /** Ids are defined by the PIECE-SORTED vocab order — the order
    * [[trainLocal]] returns and [[vocabRead]] restores, so a stored
    * model pins its id space permanently. Rejects unsorted input loudly
    * (an unsorted vocab would silently renumber every id). */
  def idModel(vocab: Seq[(String, Long)]): IdModel = {
    var i = 1
    while (i < vocab.length) {
      require(vocab(i - 1)._1 < vocab(i)._1,
        s"unigram vocab must be piece-sorted and duplicate-free for stable " +
          s"ids: '${vocab(i - 1)._1}' !< '${vocab(i)._1}'")
      i += 1
    }
    val ids = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case ((p, _), id) => ids.put(p, id) }
    new IdModel(model(vocab), ids, vocab.size)
  }

  /** Token-id stream of a whole text: Σ over whitespace words of the
    * Viterbi pieces, each mapped to its vocab id (OOV single cp → unkId).
    * Returns catalyst ArrayData — this is an expression eval body. */
  def encodeIds(s: UTF8String, im: IdModel)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString.trim
    if (str.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Int])
    val words = str.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Int](words.length * 2)
    var i = 0
    while (i < words.length) {
      val pieces = segment(words(i), im.model)
      var j = 0
      while (j < pieces.length) {
        val id = im.ids.get(pieces(j))
        out += (if (id != null) id.intValue() else im.unkId)
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Viterbi piece count of ONE word under the model. DP over code-point
    * positions; per cell the argmax is (max score, then fewer pieces,
    * then smaller split point = longer final piece) — the exact rule the
    * SQL oracle replays. */
  def encodeCount(word: String, model: Model): Int = {
    if (word.isEmpty) return 0
    // code-point split (the BPE encodeWord convention)
    val cps = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      cps(k) = new String(Character.toChars(cp)); k += 1
      i += Character.charCount(cp)
    }
    val n = cps.length
    val score = new Array[Long](n + 1)
    val pieces = new Array[Int](n + 1)
    var pos = 1
    while (pos <= n) {
      var bestScore = Long.MinValue
      var bestPieces = Int.MaxValue
      var j = math.max(0, pos - model.maxLen)
      // iterate split points ascending; strict improvement keeps the
      // SMALLEST j on ties — the longer-final-piece rule
      val sb = new java.lang.StringBuilder
      var q = j
      while (q < pos) { sb.append(cps(q)); q += 1 }
      while (j < pos) {
        val piece = sb.toString
        val mlp: java.lang.Long = model.costs.get(piece)
        val cost: Long =
          if (mlp != null) mlp.longValue()
          else if (pos - j == 1) UnkMicroLogProb
          else Long.MinValue
        if (cost != Long.MinValue) {
          val s = score(j) + cost
          val p = pieces(j) + 1
          if (s > bestScore || (s == bestScore && p < bestPieces)) {
            bestScore = s; bestPieces = p
          }
        }
        sb.delete(0, cps(j).length)
        j += 1
      }
      score(pos) = bestScore
      pieces(pos) = bestPieces
      pos += 1
    }
    pieces(n)
  }

  /** Unigram token count of a whole text: Σ over whitespace words of the
    * Viterbi piece count. Trim + `\s+`, empty-safe — the `TF.tokens`
    * convention. */
  def tokenCount(s: UTF8String, model: Model): Int = {
    val str = s.toString.trim
    if (str.isEmpty) return 0
    val words = str.split("\\s+")
    var total = 0
    var i = 0
    while (i < words.length) {
      total += encodeCount(words(i), model)
      i += 1
    }
    total
  }

  /** Train a unigram-LM vocab on a word dictionary — DRIVER-LOCAL, the
    * [[Bpe.trainLocal]] / FAISS "dictionary-sized state trains locally"
    * discipline. Viterbi-EM with frequency pruning (the deterministic
    * member of the SentencePiece trainer family: hard-EM counts instead
    * of forward-backward expectations, count-ranked pruning instead of
    * held-out likelihood loss — reproducible to the bit across runs and
    * partitionings, which the likelihood variants are not under float
    * reordering):
    *
    *  1. seed = every single code point (NEVER pruned — full coverage)
    *     plus the top `seedFactor·vocabSize` multi-cp substrings of
    *     length ≤ [[MaxPieceLen]] by corpus frequency;
    *  2. repeat until ≤ `vocabSize`: `emIters`× (E: Viterbi-segment every
    *     dict word under current micro-log-probs — the SAME integer DP
    *     as serving; M: piece counts weighted by word frequency →
    *     `mlp = round(ln(count/total)·1e6)`), then prune the weakest
    *     multi-cp pieces by (count, piece) keeping a `shrink` fraction;
    *  3. a final EM round on the surviving vocab cleans the probs.
    *
    * Returns (piece, microLogProb) sorted by piece. */
  def trainLocal(dict: Array[(String, Long)], vocabSize: Int,
                 maxPieceLen: Int = MaxPieceLen, seedFactor: Int = 8,
                 shrink: Double = 0.75, emIters: Int = 2,
                 minSeedCount: Long = 2L): Seq[(String, Long)] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(shrink > 0 && shrink < 1, "shrink must be in (0,1)")
    require(emIters >= 1, "emIters must be >= 1")

    // --- 1. seed: single code points + frequent substrings ---
    val chars = scala.collection.mutable.LinkedHashSet.empty[String]
    val subCnt = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (word, cnt) =>
      val cps = toCodePoints(word)
      var i = 0
      while (i < cps.length) {
        chars += cps(i)
        val sb = new java.lang.StringBuilder
        var len = 0
        var j = i
        while (j < cps.length && len < maxPieceLen) {
          sb.append(cps(j)); len += 1; j += 1
          if (len >= 2) {
            val p = sb.toString
            subCnt.update(p, subCnt.getOrElse(p, 0L) + cnt)
          }
        }
        i += 1
      }
    }
    val seedBudget = math.max(0, seedFactor.toLong * vocabSize - chars.size).toInt
    val seeds = subCnt.toArray
      .filter(_._2 >= minSeedCount)
      .sortBy { case (p, c) => (-c, p) }
      .take(seedBudget)
      .map(_._1)

    // char corpus frequency for initial probs
    val charCnt = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (word, cnt) =>
      toCodePoints(word).foreach(c =>
        charCnt.update(c, charCnt.getOrElse(c, 0L) + cnt))
    }

    var vocab: Array[(String, Long)] = {
      val init = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      chars.foreach(c => init += ((c, charCnt.getOrElse(c, 1L))))
      seeds.foreach(p => init += ((p, subCnt(p))))
      mStep(init.toArray)
    }

    // --- 2. EM + prune until the target size ---
    val charSet = chars.toSet
    var guard = 0
    while (vocab.length > math.max(vocabSize, charSet.size) && guard < 64) {
      guard += 1
      var it = 0
      var counts: Array[(String, Long)] = Array.empty
      while (it < emIters) { counts = eStep(dict, vocab); vocab = mStep(counts); it += 1 }
      val (charPieces, multi) = counts.partition(p => charSet.contains(p._1))
      val multiTarget0 = math.max(vocabSize - charSet.size,
        (multi.length * shrink).toInt)
      // always make progress toward the target on the final approach
      val multiTarget = if (multiTarget0 >= multi.length)
        math.max(0, vocabSize - charSet.size) else multiTarget0
      val kept = multi
        .sortBy { case (p, c) => (-c, p) }
        .take(multiTarget)
      vocab = mStep(charPieces ++ kept)
    }

    // --- 3. final clean EM round ---
    var it = 0
    while (it < emIters) { vocab = mStep(eStep(dict, vocab)); it += 1 }
    vocab.sortBy(_._1).toSeq
  }

  private def toCodePoints(word: String): Array[String] = {
    val cps = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      cps(k) = new String(Character.toChars(cp)); k += 1
      i += Character.charCount(cp)
    }
    cps
  }

  /** E-step: Viterbi counts over the dictionary, weighted by word
    * frequency — the SAME integer DP as serving (with backtrack). */
  private def eStep(dict: Array[(String, Long)],
                    vocab: Array[(String, Long)]): Array[(String, Long)] = {
    val m = model(vocab.toSeq)
    val cnt = scala.collection.mutable.HashMap.empty[String, Long]
    // chars must survive zero-count rounds: seed at 0 so mStep sees them
    vocab.foreach { case (p, _) => if (p.codePointCount(0, p.length) == 1) cnt.update(p, 0L) }
    dict.foreach { case (word, wc) =>
      segment(word, m).foreach { piece =>
        cnt.update(piece, cnt.getOrElse(piece, 0L) + wc)
      }
    }
    cnt.toArray
  }

  /** Viterbi segmentation with backtrack (training needs the pieces, not
    * just the count) — identical DP + tiebreaks to [[encodeCount]]. */
  def segment(word: String, model: Model): Array[String] = {
    val cps = toCodePoints(word)
    val n = cps.length
    if (n == 0) return Array.empty
    val score = new Array[Long](n + 1)
    val pieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var pos = 1
    while (pos <= n) {
      var bestScore = Long.MinValue
      var bestPieces = Int.MaxValue
      var bestJ = -1
      var j = math.max(0, pos - model.maxLen)
      val sb = new java.lang.StringBuilder
      var q = j
      while (q < pos) { sb.append(cps(q)); q += 1 }
      while (j < pos) {
        val piece = sb.toString
        val mlp: java.lang.Long = model.costs.get(piece)
        val cost: Long =
          if (mlp != null) mlp.longValue()
          else if (pos - j == 1) UnkMicroLogProb
          else Long.MinValue
        if (cost != Long.MinValue) {
          val s = score(j) + cost
          val p = pieces(j) + 1
          if (s > bestScore || (s == bestScore && p < bestPieces)) {
            bestScore = s; bestPieces = p; bestJ = j
          }
        }
        sb.delete(0, cps(j).length)
        j += 1
      }
      score(pos) = bestScore; pieces(pos) = bestPieces; back(pos) = bestJ
      pos += 1
    }
    val out = new Array[String](pieces(n))
    var at = n; var k = pieces(n) - 1
    while (at > 0) {
      val j = back(at)
      out(k) = cps.slice(j, at).mkString
      at = j; k -= 1
    }
    out
  }

  /** M-step: counts → micro-log-probs. Zero-count single-cp pieces keep
    * the <unk> floor (they must stay servable); zero-count multi-cp
    * pieces drop (they can never win a DP cell again). */
  private def mStep(counts: Array[(String, Long)]): Array[(String, Long)] = {
    val total = counts.map(_._2).sum.toDouble
    counts.flatMap { case (p, c) =>
      val single = p.codePointCount(0, p.length) == 1
      if (c <= 0L) {
        if (single) Some((p, UnkMicroLogProb)) else scala.None
      } else Some((p, Math.round(Math.log(c / total) * 1e6)))
    }
  }

  /** Persist a trained vocab as a (piece, micro_log_prob) parquet store —
    * the [[Bpe.mergesWrite]] train-once/serve-later discipline. */
  def vocabWrite(vocab: Seq[(String, Long)], path: String,
                 spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "micro_log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[vocabWrite]] store. Fails loudly on duplicate pieces (a
    * duplicate would make the serving HashMap silently keep one of two
    * probs). */
  def vocabRead(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Long)] = {
    val rows = spark.read.parquet(path).select("piece", "micro_log_prob")
      .collect() // model-sized
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(rows.map(_._1).distinct.length == rows.length,
      s"duplicate pieces in unigram store at $path")
    rows.toSeq
  }
}
