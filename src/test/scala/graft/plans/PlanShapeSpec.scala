package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-critical physical-plan properties so they cannot silently
  * regress: filter pushdown reaching the parquet scans, custom operators
  * actually selected, bounded-path metrics present, and shuffle-freeness
  * where the design promises it. String-level assertions over the
  * pre-execution plan (AQE's initial plan) — the properties checked here
  * are decided at planning time, not at runtime.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val queries = graft.Queries.all.toMap

  private def plan(name: String): String =
    queries(name).fn(spark, TestSpark.sf).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)

  test("q3: filters pushed to scans, top-20 never fully sorts") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must not global-sort")
    assert(p.contains("PushedFilters: [IsNotNull"), "scan-level filter pushdown lost")
  }

  test("q6: predicate pushdown reaches the lineitem scan") {
    val p = plan("q6_filtered_agg")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"),
      "range predicates must reach the parquet reader")
  }

  test("q7: custom TopKPerKeyExec is selected before the ranking window") {
    assert(plan("q7_window_topk").contains("TopKPerKey"),
      "custom bounded-heap operator not planned")
  }

  test("ann_lsh_multi: rank pruning via the bounded heap, query filter pushed") {
    // since r14 every ANN serving path's final top-k routes through
    // TopKPerKey (map-side ≤k-per-query partials — stronger than the
    // WindowGroupLimit prune this test previously accepted: the heap
    // bounds the SHUFFLE, not just the post-shuffle sort)
    val p = plan("ann_lsh_multi")
    assert(p.contains("TopKPerKey"),
      "top-k rank must prune through the bounded heap before the window")
    assert(p.contains("(vec_id") && p.contains("< 10)"),
      "query-side vec_id filter must be pushed")
  }

  test("dd_embed_cosine: bounded path rides the plan (cap metrics present)") {
    val p = plan("dd_embed_cosine")
    assert(p.contains("CollectMetrics graft_block_cap"),
      "hot-block cap accounting missing from the plan")
    assert(p.contains("arraydotproduct"), "native dot product not in use")
  }

  test("dd_minhash_lsh: text is scanned with a pruned schema, hashes shuffle") {
    val p = plan("dd_minhash_lsh")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "document scan must prune to (doc_id, text)")
    assert(p.contains("CollectMetrics graft_band_cap"),
      "degenerate-bucket cap accounting missing")
  }

  test("ta_split is shuffle-free (hash-bucket split, no Exchange)") {
    val p = plan("ta_split")
    assert(!p.contains("Exchange hashpartitioning"),
      s"deterministic split must not shuffle:\n$p")
  }

  test("dedupLines is pure narrow expression work (no Exchange at all)") {
    // the OPERATOR's plan (the query wraps it in the oracle dump's
    // orderBy, whose range Exchange is the dump's, not the operator's)
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val p = graft.operators.Corpus.dedupLines(docs)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Exchange"),
      s"within-doc line dedup must not shuffle:\n$p")
    assert(p.contains("array_distinct"), "first-occurrence dedup not in the projection")
  }

  test("ta_bigram_score: capped vocab broadcasts; bigrams never form via self-join") {
    val p = plan("ta_bigram_score")
    assert(p.contains("BroadcastExchange"), "top-V vocab must broadcast")
    // bigrams are built per-row inside the token array — a positional
    // equi-self-join of the exploded token stream would be a second
    // corpus-sized shuffle this plan must not contain
    assert(p.contains("transform(sequence(1"),
      "per-row bigram construction missing — positional join suspected")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab cap must be a bounded top-V, not a global sort")
  }

  test("ann_quantized_topk: dequantization stays in the scan projection, TopK prunes") {
    val p = plan("ann_quantized_topk")
    assert(p.contains("TopKPerKey"), "bounded-heap ranking not planned")
    assert(p.contains("arraydotproduct"), "native dot product not in use")
  }

  test("dd_simhash_pairs: candidates come from the capped band generator") {
    val p = plan("dd_simhash_pairs")
    assert(p.contains("bit_count"), "expected hamming verify in plan")
    // the cap's observe() metric rides the candidate frame — its presence
    // proves candidates route through Blocking.cappedBandCandidates
    // rather than a raw (unbounded) band self-join
    assert(p.contains("graft_band_cap"),
      s"candidate generation must be the capped/observed path:\n$p")
  }

  test("dd_ngram_jaccard: posting-cap accounting present, sizing is aggregate not window") {
    val p = plan("dd_ngram_jaccard")
    assert(p.contains("CollectMetrics graft_posting_cap"),
      "stop-shingle cap accounting missing from the plan")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "document scan must prune to (doc_id, text)")
    assert(!p.contains("Window"),
      "posting df sizing must be a partial+final aggregate, never a window")
  }

  test("ann_topk: query side broadcasts, corpus scans once") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "query set must broadcast — a corpus shuffle here is the wrong plan")
  }

  test("cp_decon_overlap: benchmark n-gram set broadcasts, corpus never shuffles on text") {
    val p = plan("cp_decon_overlap")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark side must broadcast — shuffling the corpus n-grams is the wrong plan")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "document scan must prune to (doc_id, text)")
  }

  test("cp_segment_dedup: AQE picks a broadcast anti-join for a small boiler set") {
    // the boilerplate set is data-dependent and carries NO broadcast hint
    // (an oversized set must not be forced through the driver) — so the
    // broadcast is checked on the AQE FINAL plan after execution, where the
    // tiny test-scale set must have been converted to a broadcast anti-join
    val df = queries("cp_segment_dedup").fn(spark, TestSpark.sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), "boilerplate removal must be an anti-join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "AQE must broadcast a small boiler set at runtime — a forced shuffle " +
      "join on a handful of templates is the wrong plan:\n" + p)
    assert(df.queryExecution.analyzed.toString.contains("graft_boiler_cap") ||
      df.queryExecution.logical.toString.contains("graft_boiler_cap"),
      "boilerplate-set size must be observed (graft_boiler_cap)")
  }

  test("dd_semdedup: no Exchange keys on an embedding array") {
    // the exact-duplicate pre-collapse must elect representatives via
    // xxhash64(embedding) — an Exchange hash-keyed on the array itself
    // would ship the whole embedding column as shuffle key (and sort-merge
    // compare on it) at 100 TB
    val qe = queries("dd_semdedup").fn(spark, TestSpark.sf).queryExecution
    val arrayKeyed = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.filter(_.dataType
              .isInstanceOf[org.apache.spark.sql.types.ArrayType])
          case _ => Seq.empty
        }
    }.flatten
    assert(arrayKeyed.isEmpty, s"exchanges keyed on arrays: $arrayKeyed")
  }

  test("dd_semdedup_two: no Exchange keys on an embedding array (both levels)") {
    // the two-level path adds a residual frame and a second assignment —
    // both must key their joins/exchanges on vec_id/cell/hash longs; an
    // array-keyed Exchange anywhere would ship the embedding (or its
    // residual) column as shuffle key at 100 TB
    val qe = queries("dd_semdedup_two").fn(spark, TestSpark.sf).queryExecution
    val arrayKeyed = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.filter(_.dataType
              .isInstanceOf[org.apache.spark.sql.types.ArrayType])
          case _ => Seq.empty
        }
    }.flatten
    assert(arrayKeyed.isEmpty, s"exchanges keyed on arrays: $arrayKeyed")
  }

  test("cp_pack_sequences: prefix-sum window is per range partition, never global") {
    val p = plan("cp_pack_sequences")
    assert(p.contains("Window") && p.contains("_pid"),
      "prefix sums must window WITHIN a range partition (_pid)")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "the range-partitioned token frame must be the persisted pass-1 frame")
  }

  test("cp_mix_token_budget: admission window is per range partition, never a whole domain") {
    val p = plan("cp_mix_token_budget")
    assert(p.contains("Window") && p.contains("_pid"),
      "prefix sums must window WITHIN a range partition (_pid) — a bare " +
      "per-domain window puts a whole domain on one task")
  }

  test("cp_mix_weighted: rates broadcast; the corpus pass is shuffle-free") {
    val p = plan("cp_mix_weighted")
    assert(p.contains("BroadcastHashJoin"), "rates dim must broadcast")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-domain sampling must not shuffle the corpus:\n$p")
  }

  test("ta_lm_score: vocab is a TakeOrdered broadcast; corpus text scans pruned") {
    val p = plan("ta_lm_score")
    assert(p.contains("TakeOrderedAndProject"),
      "top-V vocabulary must be a bounded TakeOrdered, never a global sort")
    assert(p.contains("BroadcastHashJoin"),
      "the V-row vocabulary must broadcast over the token stream")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "document scan must prune to (doc_id, text)")
  }

  test("cp_bm25_topk: corpus stats ride a broadcast, top-k never fully sorts") {
    val p = plan("cp_bm25_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "one-row stats frame must broadcast onto the scan")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must not global-sort")
    // tokenization is hoisted into ONE materialized `_ts` column per
    // scan pass (stats side + scoring side): with 3 query terms the
    // per-term tf/df expressions would otherwise re-run the tokenizer
    // O(terms) times per row — structurally, not trusting codegen CSE
    val tokenizes = "split\\(trim\\(".r.findAllIn(p).size
    assert(tokenizes <= 2,
      s"expected at most one tokenize per scan pass (2 total), got $tokenizes:\n$p")
  }

  test("dd_cluster_best: representative election is an aggregation, never a window sort") {
    val p = plan("dd_cluster_best")
    assert(!p.contains("Window"),
      s"max_by argmax must plan as an aggregate (map-side partials), " +
      s"not a per-cluster window sort:\n$p")
    assert(p.contains("max_by") || p.contains("MaxBy"),
      "argmax must ride the max_by aggregate")
  }

  test("cp_decon_bloom: the corpus prefilter probes per document, no pre-filter explode") {
    val p = plan("cp_decon_bloom")
    // the Bloom probe must run in the corpus scan's Filter (one boolean
    // per document); exploding first would defeat the prefilter
    val filterIdx = p.indexOf("Filter")
    val explodeIdx = p.indexOf("Generate explode")
    assert(p.contains("wordngramhashes"),
      s"prefilter gram kernel missing from the plan:\n${p.take(2000)}")
    // the probe is the codegen'd BloomMightContainAny EXPRESSION, not a
    // scala udf (which would drop the scan out of WholeStageCodegen)
    assert(p.contains("bloommightcontainany") ||
        p.contains("BloomMightContainAny"),
      s"codegen'd Bloom probe missing from the plan:\n${p.take(2000)}")
    assert(!p.toLowerCase.contains("scalaudf"),
      "the prefilter must not run as an interpreted scala udf")
    assert(explodeIdx < 0 || filterIdx >= 0,
      "prefilter must exist alongside the confirm-stage explode")
  }

  test("cp_assembly: the mix stage carries text into packing — no re-join with cleaned") {
    // the composition joins `cleaned` exactly twice (survivor filter +
    // lang attach); a third join re-deriving text for packSequences
    // would shuffle the corpus text a second time
    val p = plan("cp_assembly")
    // the packer's internal token cache also plans InMemoryTableScans —
    // count only TEXT-carrying scans (the cleaned frame's schema)
    val textScans = p.linesIterator
      .filter(_.contains("InMemoryTableScan"))
      .count(l => l.contains(" text#") || l.contains("[text#") ||
        l.contains(",text#"))
    assert(textScans <= 2,
      s"cleaned text must be scanned at most 2x (survivors + mix " +
      s"candidates) — a 3rd scan means packing re-joined it, got $textScans")
  }

  test("cp_dsir_weights: the O(buckets) model broadcasts; text shuffles nowhere") {
    val p = plan("cp_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      "the per-bucket log-ratio model must broadcast — shuffling per-doc " +
      "feature counts against a non-broadcast model is the wrong plan")
    // every Exchange must carry only narrow columns (ids, buckets, counts):
    // text appearing in a shuffle means the corpus rode a wide key
    val badExchange = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text#"))
    assert(!badExchange, "document text must never enter an Exchange")
  }

  test("cp_shuffle_seeded: global rank windows per range partition, never SinglePartition") {
    val p = plan("cp_shuffle_seeded")
    assert(p.contains("Window") && p.contains("_pid"),
      "the global row number must finish inside a range partition (_pid)")
    // the oracle's shape — one task holding the whole corpus — must not
    // appear anywhere before the final result orderBy
    val rankOnSingle = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition"))
    assert(!rankOnSingle, "rank window planned on SinglePartition — the " +
      "single-task global sort the operator exists to avoid")
  }

  test("cp_source_quota: bounded-heap TopKPerKey, not a per-source sort window") {
    val p = plan("cp_source_quota")
    assert(p.contains("TopKPerKey"), "custom bounded-heap operator not planned")
    assert(!p.contains("row_number"), "quota fell back to the window form")
  }

  test("ta_keywords: per-doc top-k on TopKPerKey; df join carries no text") {
    val p = plan("ta_keywords")
    assert(p.contains("TopKPerKey"), "custom bounded-heap operator not planned")
    val badExchange = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text#"))
    assert(!badExchange, "document text must never enter an Exchange — " +
      "tf/df frames are (id, token, count) only")
  }

  test("dd_novelty: text never enters an Exchange; the score stays integral") {
    val p = plan("dd_novelty")
    val badExchange = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text#"))
    assert(!badExchange, "novelty must shuffle (id, hash) rows, never text")
    val scoreLine = p.linesIterator.find(_.contains("novelty_micro"))
    assert(scoreLine.exists(!_.contains("cast(novelty_micro")),
      "novelty_micro must stay integral — no double rounding path")
  }

  test("ann_hybrid_rrf: bounded-heap fusion, no cartesian, no double in the score") {
    val p = plan("ann_hybrid_rrf")
    assert(p.contains("TopKPerKey"),
      "fusion top-k must ride the bounded heap, not a global sort")
    assert(!p.contains("CartesianProduct"),
      "candidate generation must never go all-pairs")
    // the RRF score is integer `div` arithmetic end-to-end: a cast to
    // double in the fused projection would reintroduce the engine-specific
    // rounding path the micro-unit design removed
    val fusedLine = p.linesIterator.find(_.contains("rrf_micro"))
    assert(fusedLine.exists(!_.contains("cast(rrf_micro")),
      "rrf_micro must stay integral")
  }

  test("pq assignment kernel is the codegen'd ArraySquaredL2, inside codegen") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .select(col("vec_id"), col("embedding"))
    val df = graft.operators.Ann.pqTopK(e, col("vec_id") < 3, k = 2,
      subspaces = 4, codes = 4, iters = 1)
    // the encode/serve plan carries the native expression, not an
    // interpreted higher-order aggregate(zip_with(...)) — the r11 lesson:
    // at 256 codes the interpreted kernel WAS the query cost
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("arraysquaredl2") || p.contains("ArraySquaredL2"),
      "PQ assignment must use the codegen'd distance kernel")
  }

  test("opq serving rotates through the codegen'd ArrayRotate projection") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .select(col("vec_id"), col("embedding"))
    val (rot, cb) = graft.operators.Ann.opqTrain(e, subspaces = 4,
      codes = 4, iters = 1, opqIters = 1)
    val df = graft.operators.Ann.opqTopKFrom(e, col("vec_id") < 3, rot, cb, 2)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    // the rotation is the native expression riding the scan as a
    // projection — NOT an interpreted transform(aggregate(zip_with))
    // (O(dims²) interpreted steps + O(dims) allocations per corpus row)
    // and NOT a UDF (which would drop the scan out of codegen)
    assert(p.contains("arrayrotate") || p.contains("ArrayRotate"),
      s"OPQ serving must rotate through the native expression:\n${p.take(2000)}")
    assert(!p.contains("UDF"), "no UDF in the OPQ serving plan")
  }
}
