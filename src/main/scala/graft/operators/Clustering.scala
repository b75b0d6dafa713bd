package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair graph — the clustering step
  * of near-dup dedup (each cluster keeps one survivor).
  *
  * Hybrid strategy: the dup-pair graph is EDGES, not corpus — orders of
  * magnitude smaller than the input by construction (bounded further by
  * [[Blocking]]'s caps). Below `maxDriverEdges` the edge list is collected
  * and union-found in memory (micro-seconds, zero extra jobs), labels
  * broadcast back. Past the bound, alternating LARGE-STAR / SMALL-STAR
  * rounds (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"): each round rewires every node toward its neighborhood
  * minimum, halving component height, so convergence is O(log n) ROUNDS —
  * not the O(diameter) of naive min-label propagation, the difference
  * between ~40 and ~millions of shuffles on a 100 TB corpus whose dup
  * graph contains a long chain. Every shuffle carries only (long, long)
  * edge pairs. Both paths produce min-id-per-component.
  */
object Clustering {

  /** @param nodes  one LONG column `id` — every node, including isolated
    *               ones (they come back as their own cluster)
    * @param edges  two LONG columns (a, b), undirected, any multiplicity
    * @return       (id, cluster_id) with cluster_id = min id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxDriverEdges: Long = 1000000L,
                          maxIters: Int = 100): DataFrame = {
    val spark = nodes.sparkSession
    val edgeRows = edges.toDF("a", "b").persist()
    val nEdges = edgeRows.count()
    try {
      if (nEdges <= maxDriverEdges) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edgeRows.collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val clusterOf = parent.keys.map(x => x -> find(x)).toMap
        val labels = spark.createDataset(clusterOf.toSeq)(
          Encoders.product[(Long, Long)]).toDF("lid", "cluster")
        nodes.toDF("id")
          .join(broadcast(labels), col("id") === col("lid"), "left")
          .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster_id"))
      } else {
        val (labels, _) = largeSmallStarCC(nodes, edgeRows, maxIters)
        labels
      }
    } finally edgeRows.unpersist()
  }

  /** QUALITY-AWARE representative selection — the step after clustering a
    * real training pipeline wants: keep the BEST copy of each near-dup
    * cluster, not the arbitrary min-id one (web crawls hold the same
    * article as clean text, a boilerplate-wrapped copy, and an OCR'd
    * mess; min-id keeps whichever was crawled first). Per cluster, the
    * member with the highest score wins, ties broken by ascending id so
    * the choice is deterministic across runs and engines.
    *
    * Shape: `max_by` AGGREGATION, not a window — partial aggregation
    * combines map-side, so the shuffle carries one candidate row per
    * (partition, cluster), and a pathological mega-cluster (a boilerplate
    * template duplicated across half the corpus chaining into one
    * component) costs a merge of partials instead of materializing and
    * sorting the whole cluster in one task. Rows carry (id, cluster_id,
    * score) — 24 bytes, never text. The argmax key `(score, -id)` is
    * unique per row (ids are unique), so ties at equal score
    * deterministically resolve to the LOWEST id with no second pass.
    *
    * @param members (id, cluster_id) from [[connectedComponents]]
    * @param scores  (id, score) — any quality signal, pre-rounded if the
    *                caller needs cross-engine ordering parity
    * @return (cluster_id, rep_id, rep_score, n_members)
    */
  def representatives(members: DataFrame, scores: DataFrame,
                      idCol: String = "id",
                      scoreCol: String = "score"): DataFrame =
    members.join(scores, Seq(idCol))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col(idCol).as("id"), col(scoreCol).as("score")),
          struct(col(scoreCol), (-col(idCol)).as("_nid"))).as("_rep"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("_rep.id").as("rep_id"),
        col("_rep.score").as("rep_score"), col("n_members"))

  /** Distributed connected components by alternating large-star/small-star.
    * One round = large-star (every node's strictly-larger neighbors rewire
    * to its neighborhood minimum) + small-star (every node's smaller
    * neighbors and itself rewire to that minimum). Both steps emit
    * (bigger, smaller) pairs, so the edge frame is canonically ordered
    * `hi > lo` throughout; at the fixpoint the edges ARE the answer — one
    * star per component, every node pointing at the component's min id.
    * Fixpoint detection compares (count, xor of edge hashes) across a
    * round — two cheap aggregates over checkpointed (long, long) rows —
    * then confirms a match with one exact anti-join against the previous
    * round's edges, so a fingerprint collision can never end the loop
    * early with a wrong labeling.
    *
    * Returns (labels, rounds). Fails loudly if `maxIters` rounds don't
    * reach the fixpoint — a silently-unconverged labeling is a wrong
    * dedup, not a slow one.
    */
  private[graft] def largeSmallStarCC(nodes: DataFrame, edges: DataFrame,
                                      maxIters: Int): (DataFrame, Int) = {
    var e = edges.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct().localCheckpoint(true)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(e)
    var rounds = 0
    var converged = e.isEmpty
    while (!converged && rounds < maxIters) {
      // large-star: u's neighborhood min m(u) = min(u ∪ Γ(u)); every
      // strictly-larger neighbor v > u re-attaches as (v, m(u))
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct().localCheckpoint(true)
      // small-star on (hi, lo) pairs: per hi, m = min(lo); each other lo
      // and hi itself re-attach to m
      val m2 = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val ss = ls.join(m2, "hi").filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(m2.select(col("hi"), col("m").as("lo")))
        .distinct().localCheckpoint(true)
      val fp2 = fingerprint(ss)
      // the (count, xor-of-hash) fingerprint is necessary but not
      // sufficient: a collision between two different edge sets would
      // silently return a wrong labeling. Counts are equal whenever the
      // fingerprints match, so one empty anti-join proves set equality —
      // it runs only on a fingerprint match, i.e. once, at termination
      converged = fp2 == fp &&
        ss.join(e, Seq("hi", "lo"), "left_anti").isEmpty
      fp = fp2
      e = ss
      rounds += 1
    }
    // never return a silently-unconverged labeling: a pathological graph
    // beyond maxIters must fail loudly, not mislabel
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge after $maxIters rounds — " +
      s"raise maxIters")
    val labels = nodes.toDF("id")
      .join(e.select(col("hi").as("id"), col("lo").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
    (labels, rounds)
  }

  /** PageRank over an undirected pair graph — duplication-centrality as a
    * quality signal (a document whose near-dup neighborhood is large and
    * well-connected is boilerplate-adjacent; CommonCrawl pipelines use
    * link-graph ranks the same way). Fixed `iters` power iterations of
    * the classic update
    *
    *   r'(v) = round((1−d)/N + d · Σ_{u→v} round(r(u)/deg(u), 6), 6)
    *
    * with BOTH rounding points at 6 decimals so every iteration is
    * engine-exact. The whole iteration runs in integer MICRO-units
    * (rank × 10⁶ as LONG): round-HALF-UP of a positive quotient a/b is
    * `(2a + b) div (2b)` and of d·x (d in micro) is
    * `(d·x + 500000) div 1000000` — pure long arithmetic that every
    * engine evaluates bit-identically, with no double or decimal
    * division anywhere (a double round can differ across engines at
    * representation boundaries; longs cannot). N is the node count
    * (isolated docs participate and settle at round((1−d)/N)), no
    * dangling redistribution (an undirected graph has none). Only the
    * final projection rescales micro → DECIMAL(18,6) by an exact
    * decimal multiply.
    *
    * Scale shape: per iteration one join of the O(edges) contribution
    * frame against the rank frame and one partial+final LONG sum —
    * narrower and cheaper than the former decimal frames;
    * `localCheckpoint` truncates lineage each round like
    * [[connectedComponents]]' star rounds. Driver sees only the node
    * COUNT.
    *
    * @param nodes one LONG column `id` (every node, isolated included)
    * @param edges two LONG columns (a, b), undirected; multiplicity is
    *              collapsed (each unordered pair contributes once)
    * @return (id, rank) — DECIMAL(18,6) ranks summing to ~1 */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame =
    // exact rescale: micro × 1e-6 as a decimal MULTIPLY (never a divide —
    // decimal/decimal division takes engine-specific scale paths)
    pageRankMicro(nodes, edges, iters, damping).select(col("id"),
      (col("rank_micro").cast("decimal(18,6)") *
        lit(new java.math.BigDecimal("0.000001")))
        .cast("decimal(18,6)").as("rank"))

  /** [[pageRank]] without the final decimal projection: the raw
    * `(id, rank_micro)` LONG frame — every value an exact integer
    * micro-unit, which is the representation-insensitive form to
    * compare across engines (a BIGINT has one encoding everywhere;
    * DECIMAL(18,6) has engine-specific parquet physical types and
    * trailing-zero conventions). */
  def pageRankMicro(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
                    damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the node-id frame is consumed iters+2 times (count, rank init, one
    // left join per iteration) — materialize the 8-byte ids ONCE (r22,
    // guide §2.4: don't re-run the upstream scan per iteration; eager
    // localCheckpoint cuts the lineage like the edge frames below, and
    // its blocks are GC-reclaimed, never cache-manager entries)
    val nodeIds = nodes.toDF("id").localCheckpoint(true)
    val n = nodeIds.count()
    // canonical undirected edge set, then both directions for out-flow
    val und = edges.toDF("a", "b")
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val dir = und.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
      .localCheckpoint(true)
    // edges carry degree inline: one narrow frame feeds every iteration
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val dirDeg = dir.join(deg, Seq("src")).localCheckpoint(true)
    // damping in micro-units; the two driver-side constants are exact
    // integer HALF-UP roundings (all operands positive, so the floor
    // `div` of (2a+b)/(2b) IS round-half-up of a/b)
    val dampMicro = math.round(damping * 1000000L)
    val baseMicro = (2L * (1000000L - dampMicro) + n) / (2L * n)
    var ranks = nodeIds
      .select(col("id"), lit((2L * 1000000L + n) / (2L * n)).as("rank_micro"))
    for (it <- 1 to iters) {
      val contrib = dirDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("(2 * rank_micro + deg) div (2 * deg)").as("c"))
      val inflow = contrib.groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      ranks = nodeIds
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(baseMicro) + expr(
            s"($dampMicro * coalesce(inflow, CAST(0 AS BIGINT)) + 500000)" +
              " div 1000000")).as("rank_micro"))
      // lineage truncation is for LONG runs — an eager checkpoint per
      // round turns 5 iterations into 5 driver-synchronized jobs. Let
      // Catalyst fuse short runs into one DAG and cut only every 4th.
      if (it % 4 == 0 && it < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
