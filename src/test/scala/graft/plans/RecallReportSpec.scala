package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The `graft sections --recall` table: every ANN variant the recall
  * harness measures maps to a section config line, so the bench record
  * is readable at authoring time. */
class RecallReportSpec extends AnyFunSuite {

  private val record =
    """{"metric":"total","value":1.0,"recall_at_10":{"ann_lsh_topk":0.1400,
      |"ann_lsh_multi":0.5200,"ann_lsh_default":0.5200,"ann_ivf_pq":0.2100,
      |"ann_pq_topk":0.4000},"queries":{}}""".stripMargin.replace("\n", "")

  test("renders measured recall against the variant map; absent lines show --") {
    val out = RecallReport.render(record)
    assert(out.contains("ann_lsh_topk") && out.contains("0.14"))
    assert(out.contains("ann_ivf_pq") && out.contains("0.21"))
    // present lines carry their section config
    assert(out.contains("variant: lsh_single"))
    assert(out.contains("variant: ivf_pq"))
    // a variant the record lacks renders as -- rather than vanishing
    assert(out.linesIterator.exists(l =>
      l.startsWith("ann_pca_brute") && l.contains("--")))
  }

  test("variant map covers exactly the recall harness's bench lines") {
    // pinned against Bench.scala's recall block: a new harness line must
    // be added HERE too, or authors lose its visibility
    val expected = Set("ann_lsh_topk", "ann_lsh_probe", "ann_lsh_multi",
      "ann_lsh_default", "ann_ivf_topk", "ann_ivf_untrained",
      "ann_ivf_balanced", "ann_ivf_default", "ann_rp_brute",
      "ann_rp_brute32", "ann_pca_brute", "ann_pq_topk", "ann_ivf_pq",
      "ann_pq_4bit", "ann_ivf_pq_4bit", "ann_quantized_topk",
      "ann_pq_rerank", "ann_pq_4bit_rerank", "ann_ivf_pq_rerank",
      "ann_ivf_pq_4bit_rerank", "ann_opq_topk", "ann_opq_rerank")
    assert(RecallReport.variants.map(_._1).toSet == expected)
  }

  test("malformed or recall-less records degrade to an all--- table") {
    val out = RecallReport.render("""{"queries":{}}""")
    assert(out.linesIterator.size == RecallReport.variants.size + 1)
    assert(out.contains("--"))
  }
}
