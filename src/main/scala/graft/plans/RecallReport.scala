package graft.plans

/** Authoring-time visibility for the ANN quality/cost tradeoff: renders
  * the last bench record's `recall_at_10` block as a per-variant table
  * mapped to the `ann_topk` section configs that reproduce each line.
  *
  * Why this exists: the bench GATES only the `ivf_pq` default (≥ 0.2),
  * but a spec author choosing `variant: lsh` vs `rp`/`pca` projection
  * dims picks an operating point blind — `ann_lsh_topk` at 0.14 or
  * `ann_rp_brute` at 0.10 recall@10 is the EXPECTED price of that cost
  * tier, and the only place the number lived was a JSON blob in the
  * repo root. `graft sections --recall` puts the measured table next to
  * the registry the author is already reading. */
object RecallReport {

  /** bench line -> (the section config that reproduces it, cost note).
    * Order is the reading order: exact baselines first, then hash
    * families, trained quantizers, compressed codes. */
  val variants: Seq[(String, String, String)] = Seq(
    ("ann_quantized_topk", "variant: brute over int8-quantized vectors",
      "4x smaller at rest; near-exact"),
    ("ann_lsh_default", "variant: lsh (multi-table default)",
      "no training; tables x bits bound cost"),
    ("ann_lsh_multi", "variant: lsh_multi", "same path as the default"),
    ("ann_lsh_probe", "variant: lsh_probe",
      "single table + neighbor buckets"),
    ("ann_lsh_topk", "variant: lsh_single",
      "cheapest hash tier - floor recall"),
    ("ann_ivf_default", "variant: ivf (K ~ sqrt(n), probes ~ K/4)",
      "trained; probed fraction sets recall"),
    ("ann_ivf_topk", "variant: ivf, k_centroids: 16, probes: 2",
      "the oracle config - probes/K = 1/8"),
    ("ann_ivf_balanced", "variant: ivf + balanced quantizer",
      "hot cells split; recall comparable to ivf"),
    ("ann_ivf_untrained", "variant: ivf, centroid_where: ...",
      "untrained baseline the trained index must beat"),
    ("ann_rp_brute", "random projection 64 -> 16 dims, then brute",
      "4x compression, untrained"),
    ("ann_rp_brute32", "random projection 64 -> 32 dims, then brute",
      "2x compression, untrained"),
    ("ann_pca_brute", "pca_project 64 -> 16 dims, then brute",
      "trained basis at rp's compression"),
    ("ann_pq_topk", "variant: pq (8 subspaces x 256 codes)",
      "32x compression, ADC scoring"),
    ("ann_pq_4bit", "variant: pq, codes: 16",
      "64x compression - floor recall"),
    ("ann_ivf_pq", "variant: ivf_pq (K 16, probes 2, 8-bit)",
      "GATED >= 0.2 - the at-scale default"),
    ("ann_ivf_pq_4bit", "variant: ivf_pq, codes: 16",
      "max compression - bottom rung, floor recall BY DESIGN"),
    ("ann_pq_rerank", "variant: pq, refine: 100",
      "exact rerank repairs 8-bit codes"),
    ("ann_pq_4bit_rerank", "variant: pq, codes: 16, refine: 100",
      "rerank over the 4-bit floor"),
    ("ann_ivf_pq_rerank", "variant: ivf_pq, probes: 6, refine: 100",
      "GATED >= 0.5 - the refined default"),
    ("ann_ivf_pq_4bit_rerank", "variant: ivf_pq, codes: 16, probes: 6, refine: 600",
      "GATED >= 0.5 - wide cut repairs 4-bit"),
    ("ann_opq_topk", "variant: opq (learned rotation + PQx8)",
      "what the rotation buys at equal budget"),
    ("ann_opq_rerank", "variant: opq, refine: 100",
      "rotated ADC + exact rerank"))

  /** Extract `recall_at_10` from a bench record line (the one-line JSON
    * Bench prints and writes to bench_last.json). */
  def recallBlock(benchJson: String): Map[String, Double] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(benchJson).path("recall_at_10")
    if (!node.isObject) Map.empty
    else {
      val it = node.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    }
  }

  /** The table, one line per known variant; variants absent from the
    * record render as `--` (the record predates them or the recall
    * harness was filtered out). */
  def render(benchJson: String): String = {
    val rec = recallBlock(benchJson)
    val header = f"${"bench line"}%-20s ${"recall@10"}%9s  section config / note"
    val rows = variants.map { case (name, config, note) =>
      val r = rec.get(name).map(v => f"$v%9.2f").getOrElse(f"${"--"}%9s")
      f"$name%-20s $r  $config ($note)"
    }
    (header +: rows).mkString("\n")
  }
}
