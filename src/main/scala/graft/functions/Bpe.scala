package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding ENCODE against a learned merge table, as one native
  * expression: tokenize (trim + `\s+`, the engine-wide convention), split
  * each word to characters, then repeatedly merge the LOWEST-RANK,
  * LEFTMOST adjacent pair present in the merge table until none applies —
  * the HuggingFace-style greedy encode loop (re-scan after every merge, so
  * merges that surface new lower-rank pairs are honored).
  *
  * One-occurrence-at-a-time (rank, then position) is used deliberately:
  * it is observationally identical to the classic merge-all-occurrences
  * pass (left-to-right resolution of overlapping runs falls out for
  * free), and it is exactly replayable as a recursive SQL CTE — one
  * recursion step per merge — which is how the DuckDB oracle checks this
  * expression against the same learned table.
  *
  * The merge table rides into generated code as a reference object
  * (rank-indexed HashMap), so the whole encode stays inside
  * WholeStageCodegen — this is a per-row narrow op over the full corpus,
  * the same hot path as the other tokenizer expressions.
  */
case class BpeTokenCount(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  @transient private lazy val ranks = Bpe.rankMap(merges)

  override def nullSafeEval(v: Any): Any =
    Bpe.tokenCount(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: janino compiles no generics
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.tokenCount($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeTokenCount {
  def apply(c: Column, merges: Seq[String]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(c), merges))
}

/** BPE ENCODE to TOKEN IDS — the HF-tokenizer-compatible output shape
  * (vocab.json + merges.txt): the same greedy encode as [[BpeTokenCount]],
  * each final piece mapped to its id under the model's vocab (base
  * alphabet first, then merge outputs in rank order — [[Bpe.vocabFromMerges]]);
  * characters outside the training alphabet take the reserved id V. */
case class BpeEncodeIds(child: Expression, merges: Seq[String],
                        vocab: Seq[(String, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got $t")
    }

  @transient private lazy val model = Bpe.idModel(merges, vocab)

  override def nullSafeEval(v: Any): Any =
    Bpe.encodeIds(v.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdModel", model,
      "graft.functions.Bpe$IdModel")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeIds($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncodeIds {
  def apply(c: Column, merges: Seq[String], vocab: Seq[(String, Int)]): Column =
    ColumnBridge.column(
      BpeEncodeIds(ColumnBridge.expression(c), merges, vocab))
}

object Bpe {

  /** Merge list ("left right", rank = position) → rank lookup. */
  def rankMap(merges: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (pair, i) =>
      require(pair.count(_ == ' ') == 1,
        s"merge must be 'left right', got '$pair'")
      m.put(pair, i)
    }
    m
  }

  /** Encode ONE word: char split, then repeat { find the (lowest-rank,
    * leftmost) adjacent pair in the table; merge that one occurrence }
    * until no pair applies. Exactly the recursive-CTE step the oracle
    * replays. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var parts = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      parts(k) = new String(Character.toChars(cp)); k += 1
      i += Character.charCount(cp)
    }
    var done = parts.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < parts.length - 1) {
        val r = ranks.get(parts(j) + " " + parts(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val next = new Array[String](parts.length - 1)
        System.arraycopy(parts, 0, next, 0, bestAt)
        next(bestAt) = parts(bestAt) + parts(bestAt + 1)
        System.arraycopy(parts, bestAt + 2, next, bestAt + 1,
          parts.length - bestAt - 2)
        parts = next
        done = parts.length <= 1
      }
    }
    parts
  }

  /** The id space a (merges, alphabet) model defines — HF's vocab.json
    * shape: the base ALPHABET first (in the given order — callers pass it
    * code-point-sorted, [[graft.operators.Corpus.bpeAlphabet]]), then
    * each merge's OUTPUT piece in rank order, skipping strings already
    * assigned (two merge paths can concatenate to the same string; the
    * FIRST assignment wins, matching a piece→id map built rank-ascending).
    * Ids are contiguous 0..V−1; V is the reserved `<unk>`. */
  def vocabFromMerges(merges: Seq[String], alphabet: Seq[String])
      : Seq[(String, Int)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    alphabet.foreach { c =>
      require(c.nonEmpty, "empty alphabet symbol")
      require(!out.contains(c), s"duplicate alphabet symbol '$c'")
      out(c) = out.size
    }
    merges.foreach { pair =>
      val piece = pair.replace(" ", "")
      if (!out.contains(piece)) out(piece) = out.size
    }
    out.toSeq
  }

  /** A (merges, vocab) pair must be two halves of ONE trained model:
    * every merge's parts and its product piece must have vocab ids (a
    * vocab from a DIFFERENT training run maps them to `<unk>` and the id
    * stream silently degenerates — no exception, just wrong ids). Fails
    * loudly naming both stores so a mismatched nightly deploy is caught
    * at load, not in a training run weeks later. */
  def requireCompanion(merges: Seq[String], vocab: Seq[(String, Int)],
                       mergesPath: String, vocabPath: String): Unit = {
    val pieces = vocab.iterator.map(_._1).toSet
    val missing = merges.iterator
      .flatMap(m => m.split(" ", 2).toSeq :+ m.replace(" ", ""))
      .filterNot(pieces).take(3).toSeq
    require(missing.isEmpty,
      s"BPE vocab store at $vocabPath is not the companion of the merge " +
        s"store at $mergesPath: ${missing.mkString("'", "', '", "'")} " +
        "carry no id (stores from different training runs?)")
  }

  /** Serving-side ID model: merge ranks for the encode loop + piece→id +
    * the reserved `<unk>` id V. Janino-visible — codegen references it
    * by name. */
  final class IdModel(val ranks: java.util.HashMap[String, Integer],
                      val ids: java.util.HashMap[String, Integer],
                      val unkId: Int) extends Serializable

  def idModel(merges: Seq[String], vocab: Seq[(String, Int)]): IdModel = {
    val ids = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (p, id) =>
      require(id >= 0 && id < vocab.size,
        s"BPE vocab ids must be contiguous 0..V-1, got $id for '$p'")
      require(ids.put(p, id) == null, s"duplicate piece '$p' in BPE vocab")
    }
    new IdModel(rankMap(merges), ids, vocab.size)
  }

  /** Token-id stream of a whole text: Σ over whitespace words of the
    * greedy-encoded pieces, each mapped to its vocab id (out-of-alphabet
    * single cp → unkId). Returns catalyst ArrayData — expression eval. */
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
      val pieces = encodeWord(words(i), im.ranks)
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

  /** Persist a (piece, id) vocab — the id-space half of the BPE model
    * (the merge store is the encode half; HF ships the same pair). */
  def vocabWrite(vocab: Seq[(String, Int)], path: String,
                 spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "id")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[vocabWrite]] store in id order; [[idModel]] re-validates
    * contiguity and uniqueness loudly. */
  def vocabRead(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Int)] = {
    spark.read.parquet(path).select("piece", "id")
      .collect() // model-sized
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq
  }

  /** BPE token count of a whole text: Σ over whitespace words of the
    * encoded part count. Trim + `\s+`, empty-safe — the `TF.tokens`
    * convention. */
  def tokenCount(s: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    val str = s.toString.trim
    if (str.isEmpty) return 0
    val words = str.split("\\s+")
    var total = 0
    var i = 0
    while (i < words.length) {
      total += encodeWord(words(i), ranks).length
      i += 1
    }
    total
  }

  /** Code-point order — what Spark's binary UTF8String comparison (and
    * DuckDB's UTF-8 byte order) yields for `ORDER BY pair ASC`. Java's
    * `String.compareTo` is UTF-16 code-UNIT order, which disagrees once
    * astral code points meet U+E000..U+FFFF, so it cannot be used for
    * the argmax tiebreak. */
  def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** One word's adjacent-pair bag (every adjacent position, overlapping
    * runs counted per-position — exactly the explode the distributed
    * training round aggregates). */
  private def pairBag(parts: Array[String]): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < parts.length - 1) {
      m.merge(parts(i) + " " + parts(i + 1), 1, (a, b) => a + b)
      i += 1
    }
    m
  }

  /** DRIVER-side BPE training over a collected `(word, count)` dictionary —
    * the classic incremental algorithm every production trainer uses once
    * corpus text has been reduced to word frequencies: global pair counts
    * and a pair→words inverted index are maintained under exact long
    * arithmetic, so each merge touches only the words that CONTAIN the
    * chosen pair instead of recounting the dictionary (and instead of one
    * engine job per merge — a 10k-merge vocabulary is a driver loop, not
    * 10k scheduled jobs).
    *
    * Bit-identical to the distributed round
    * ([[graft.operators.Corpus.bpeTrain]]'s fallback loop): same pair bag
    * (overlap counted per adjacent position), same argmax tiebreak
    * (count desc, then pair asc in CODE-POINT order — Spark/DuckDB binary
    * string order, NOT Java compareTo), same all-occurrences
    * left-to-right [[applyMerge]] fold, same `minPairCount` stop. The
    * result is independent of dictionary row order: deltas are exact
    * sums and the argmax is a total order.
    */
  def trainLocal(dict: Array[(String, Long)], maxMerges: Int,
                 minPairCount: Long): Seq[String] = {
    val nW = dict.length
    val parts = new Array[Array[String]](nW)
    val wcnt = new Array[Long](nW)
    val pairCount = new java.util.HashMap[String, Long]()
    val pairWords = new java.util.HashMap[String, java.util.BitSet]()
    var i = 0
    while (i < nW) {
      val (w, c) = dict(i)
      val p = new Array[String](w.codePointCount(0, w.length))
      var ci = 0; var k = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        p(k) = new String(Character.toChars(cp)); k += 1
        ci += Character.charCount(cp)
      }
      parts(i) = p; wcnt(i) = c
      val bag = pairBag(p)
      val it = bag.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        pairCount.merge(e.getKey, e.getValue.toLong * c, (a, b) => a + b)
        pairWords.computeIfAbsent(e.getKey, _ => new java.util.BitSet()).set(i)
      }
      i += 1
    }
    // count desc, pair code-point asc — first() IS the round's argmax
    val order = new java.util.TreeSet[(Long, String)](pairComparator)
    val pcIt = pairCount.entrySet().iterator()
    while (pcIt.hasNext) { val e = pcIt.next(); order.add((e.getValue, e.getKey)) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done && merges.size < maxMerges) {
      if (order.isEmpty) done = true
      else {
        val best = order.first()
        if (best._1 < minPairCount) done = true
        else {
          val pair = best._2
          val sp = pair.indexOf(' ')
          val l = pair.substring(0, sp); val r = pair.substring(sp + 1)
          merges += pair
          val members = pairWords.get(pair)
          val delta = new java.util.HashMap[String, Long]()
          var idx = members.nextSetBit(0)
          while (idx >= 0) {
            val before = pairBag(parts(idx))
            val after = applyMerge(parts(idx), l, r)
            parts(idx) = after
            val abag = pairBag(after)
            val c = wcnt(idx)
            val bIt = before.entrySet().iterator()
            while (bIt.hasNext) {
              val e = bIt.next()
              delta.merge(e.getKey, -e.getValue.toLong * c, (a, b) => a + b)
              if (!abag.containsKey(e.getKey)) {
                val bs = pairWords.get(e.getKey)
                if (bs != null) bs.clear(idx)
              }
            }
            val aIt = abag.entrySet().iterator()
            while (aIt.hasNext) {
              val e = aIt.next()
              delta.merge(e.getKey, e.getValue.toLong * c, (a, b) => a + b)
              pairWords.computeIfAbsent(e.getKey, _ => new java.util.BitSet())
                .set(idx)
            }
            idx = members.nextSetBit(idx + 1)
          }
          val dIt = delta.entrySet().iterator()
          while (dIt.hasNext) {
            val e = dIt.next()
            if (e.getValue != 0L) {
              val old = pairCount.getOrDefault(e.getKey, 0L)
              val neu = old + e.getValue
              if (old > 0L) order.remove((old, e.getKey))
              if (neu > 0L) { pairCount.put(e.getKey, neu); order.add((neu, e.getKey)) }
              else { pairCount.remove(e.getKey); pairWords.remove(e.getKey) }
            }
          }
        }
      }
    }
    merges.toSeq
  }

  /** The training argmax's total order: count desc, then pair asc in
    * code-point order (Spark/DuckDB binary string order). */
  private def pairComparator: java.util.Comparator[(Long, String)] =
    new java.util.Comparator[(Long, String)] {
      override def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else codePointCompare(a._2, b._2)
      }
    }

  /** One WINDOW of provably-global-argmax merges over a PARTIAL
    * dictionary — the driver half of [[graft.operators.Corpus.bpeTrain]]'s
    * batched distributed fallback. The engine collects only the words
    * containing at least one HOT pair (global count > `thetaExcl`; every
    * word holding a hot-pair occurrence is in `dict`, so hot-pair counts
    * and all their future deltas are EXACT here), plus the hot pairs'
    * global base counts. The window then replays the sequential
    * algorithm locally, accepting a merge only while it can PROVE the
    * local argmax is the global one:
    *
    *  - hot pairs: exact totals (base + exact deltas — all their
    *    occurrences live in collected words, before and after merges);
    *  - any other pair: unknown base ≤ `thetaExcl` (by hotness
    *    definition) plus an exactly-tracked delta (merges only touch
    *    collected words), so its total ≤ thetaExcl + max positive delta;
    *  - the window CLOSES (returns) as soon as the best hot total is ≤
    *    that intrusion bound — a created/boosted pair might outrank it,
    *    and only a global recount can order them — or drops below
    *    `minPairCount` (global termination is the outer loop's call).
    *
    * Window boundaries never change the merge sequence: each accepted
    * merge is the true global argmax at its turn, and the outer loop
    * resumes from an exact recount. Identical list, ~batch-size fewer
    * jobs per merge. */
  def trainWindow(dict: Array[(Array[String], Long)],
                  hotCounts: Map[String, Long],
                  thetaExcl: Long, maxMerges: Int,
                  minPairCount: Long): Seq[String] = {
    val nW = dict.length
    val parts = new Array[Array[String]](nW)
    val wcnt = new Array[Long](nW)
    val pairWords = new java.util.HashMap[String, java.util.BitSet]()
    var i = 0
    while (i < nW) {
      parts(i) = dict(i)._1; wcnt(i) = dict(i)._2
      val bag = pairBag(parts(i))
      val it = bag.entrySet().iterator()
      while (it.hasNext) {
        pairWords.computeIfAbsent(it.next().getKey,
          _ => new java.util.BitSet()).set(i)
      }
      i += 1
    }
    val totals = new java.util.HashMap[String, Long]()
    val order = new java.util.TreeSet[(Long, String)](pairComparator)
    hotCounts.foreach { case (p, c) => totals.put(p, c); order.add((c, p)) }
    // signed deltas of non-hot pairs; positive ones ride a TreeSet so the
    // intrusion bound is O(1) per accepted merge
    val unknown = new java.util.HashMap[String, Long]()
    val unknownOrder = new java.util.TreeSet[(Long, String)](pairComparator)
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var stop = false
    while (!stop && merges.size < maxMerges) {
      if (order.isEmpty) stop = true
      else {
        val best = order.first()
        val maxUnknown =
          if (unknownOrder.isEmpty) 0L else unknownOrder.first()._1
        if (best._1 < minPairCount) stop = true
        else if (best._1 <= thetaExcl + maxUnknown) stop = true
        else {
          val pair = best._2
          val sp = pair.indexOf(' ')
          val l = pair.substring(0, sp); val r = pair.substring(sp + 1)
          merges += pair
          val members = pairWords.get(pair)
          require(members != null,
            s"hot pair '$pair' has no collected occurrence — the hot-word " +
            "collection predicate and the hot set disagree")
          val delta = new java.util.HashMap[String, Long]()
          var idx = members.nextSetBit(0)
          while (idx >= 0) {
            val before = pairBag(parts(idx))
            val after = applyMerge(parts(idx), l, r)
            parts(idx) = after
            val abag = pairBag(after)
            val c = wcnt(idx)
            val bIt = before.entrySet().iterator()
            while (bIt.hasNext) {
              val e = bIt.next()
              delta.merge(e.getKey, -e.getValue.toLong * c, (a, b) => a + b)
              if (!abag.containsKey(e.getKey)) {
                val bs = pairWords.get(e.getKey)
                if (bs != null) bs.clear(idx)
              }
            }
            val aIt = abag.entrySet().iterator()
            while (aIt.hasNext) {
              val e = aIt.next()
              delta.merge(e.getKey, e.getValue.toLong * c, (a, b) => a + b)
              pairWords.computeIfAbsent(e.getKey, _ => new java.util.BitSet())
                .set(idx)
            }
            idx = members.nextSetBit(idx + 1)
          }
          val dIt = delta.entrySet().iterator()
          while (dIt.hasNext) {
            val e = dIt.next()
            if (e.getValue != 0L) {
              if (totals.containsKey(e.getKey)) {
                val old = totals.get(e.getKey)
                val neu = old + e.getValue
                order.remove((old, e.getKey))
                if (neu > 0L) { totals.put(e.getKey, neu)
                  order.add((neu, e.getKey)) }
                else totals.remove(e.getKey)
              } else {
                val old = unknown.getOrDefault(e.getKey, 0L)
                val neu = old + e.getValue
                if (old > 0L) unknownOrder.remove((old, e.getKey))
                if (neu != 0L) unknown.put(e.getKey, neu)
                else unknown.remove(e.getKey)
                if (neu > 0L) unknownOrder.add((neu, e.getKey))
              }
            }
          }
        }
      }
    }
    merges.toSeq
  }

  /** Persist a learned merge list as a parquet MODEL STORE `(rank,
    * pair)` — the train-once/serve-later shape the ANN model stores
    * follow ([[graft.operators.Ann.pqCodebooksWrite]]): the nightly
    * tokenizer-training job writes the merges; encode jobs load them
    * with zero retraining. Model-sized (one row per merge). */
  def mergesWrite(merges: Seq[String], path: String,
                  spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case (m, i) => (i, m) }
      .toDF("rank", "pair")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[mergesWrite]] store back in rank order — bit-identical to
    * what was written. Fails loudly on a sparse store (a missing rank
    * renumbers every later merge and silently changes the encode). */
  def mergesRead(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[String] = {
    val rows = spark.read.parquet(path).select("rank", "pair")
      .collect() // model-sized
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"sparse BPE merge store at $path: ranks ${rows.map(_._1).mkString(",")}")
    rows.map(_._2).toSeq
  }

  /** Apply ALL occurrences of one pair left-to-right (the training-round
    * update: the chosen merge is folded into every word of the dict). */
  def applyMerge(parts: Array[String], left: String, right: String): Array[String] = {
    if (parts.length < 2) return parts
    val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (i < parts.length - 1 && parts(i) == left && parts(i + 1) == right) {
        out += left + right; i += 2
      } else { out += parts(i); i += 1 }
    }
    out.toArray
  }
}

/** Training-round helper expression: fold one learned merge into a word's
  * current part list (all occurrences, left-to-right). Used by
  * [[graft.operators.Corpus.bpeTrain]]'s per-round dictionary update —
  * narrow, codegen'd, no shuffle. */
case class BpeMergeApply(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    BpeMergeApply.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], left, right)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", left, "java.lang.String")
    val r = ctx.addReferenceObj("bpeRight", right, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeMergeApply.compute($c, $l, $r)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Apply a WINDOW of merges in rank order as ONE expression. A
  * [[BpeMergeApply]] chain nests one call per merge, so a 64-merge
  * window compiles a 64-deep expression tree — wide enough to push the
  * generated method toward Janino's 64KB limit, where whole-stage
  * codegen silently falls back to interpreted eval; it also
  * re-materializes the parts array once per level. This form keeps the
  * tree depth at 1 for ANY window size (the merge loop runs in data
  * space) and materializes the array once per row. */
case class BpeMergesApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  private val lefts: Array[String] = merges.map(_._1).toArray
  private val rights: Array[String] = merges.map(_._2).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argument must be array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    BpeMergesApply.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeMergesApply.compute($c, $l, $r)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeMergesApply {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(parts: ArrayData, lefts: Array[String],
              rights: Array[String]): ArrayData = {
    val n = parts.numElements()
    var arr = new Array[String](n)
    var i = 0
    while (i < n) { arr(i) = parts.getUTF8String(i).toString; i += 1 }
    var k = 0
    while (k < lefts.length && arr.length >= 2) {
      arr = Bpe.applyMerge(arr, lefts(k), rights(k))
      k += 1
    }
    new GenericArrayData(arr.map(UTF8String.fromString(_)))
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeMergesApply(ColumnBridge.expression(c), merges))
}

object BpeMergeApply {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(parts: ArrayData, left: String, right: String): ArrayData = {
    // always materialize: the input ArrayData may be an UnsafeArrayData
    // view over a buffer Spark reuses across rows
    val n = parts.numElements()
    val arr = new Array[String](n)
    var i = 0
    while (i < n) { arr(i) = parts.getUTF8String(i).toString; i += 1 }
    val merged = if (n < 2) arr else Bpe.applyMerge(arr, left, right)
    new GenericArrayData(merged.map(UTF8String.fromString(_)))
  }

  def apply(c: Column, left: String, right: String): Column =
    ColumnBridge.column(BpeMergeApply(ColumnBridge.expression(c), left, right))
}
