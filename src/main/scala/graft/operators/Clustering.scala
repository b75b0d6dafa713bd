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
  * broadcast back. Past the bound, distributed min-label iteration: each
  * round every node takes the min label among itself and its neighbors,
  * converging in O(component diameter) rounds over shuffles that carry
  * only (id, label) longs. Both paths produce min-id-per-component.
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
        val sym = edgeRows.select(col("a").as("src"), col("b").as("dst"))
          .union(edgeRows.select(col("b").as("src"), col("a").as("dst"))).persist()
        var labels = nodes.toDF("id")
          .select(col("id"), col("id").as("cluster")).localCheckpoint(true)
        var changed = 1L
        var iter = 0
        try {
          while (changed > 0 && iter < maxIters) {
            val nbrMin = sym.join(labels, col("dst") === col("id"))
              .groupBy(col("src")).agg(min(col("cluster")).as("nbr_min"))
            val next = labels.join(nbrMin, col("id") === col("src"), "left")
              .select(col("id"),
                least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
                  .as("cluster"))
              .localCheckpoint(true)
            changed = next.as("n")
              .join(labels.as("o"), col("n.id") === col("o.id"))
              .filter(col("n.cluster") =!= col("o.cluster")).count()
            labels = next
            iter += 1
          }
        } finally sym.unpersist()
        // never return a silently-unconverged labeling: a component with
        // diameter beyond maxIters must fail loudly, not mislabel
        if (changed > 0) throw new IllegalStateException(
          s"connected components did not converge after $maxIters rounds " +
          s"($changed labels still moving) — raise maxIters")
        labels.select(col("id"), col("cluster").as("cluster_id"))
      }
    } finally edgeRows.unpersist()
  }
}
