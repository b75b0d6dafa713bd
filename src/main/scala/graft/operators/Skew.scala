package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one user/origin/key holding a disproportionate share of rows — the
  * normal case in web-scale training corpora).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in our sessions) handles sort-merge joins after the fact; the
  * explicit salt below is the plan-level tool for aggregate-then-join
  * shapes and for engines/paths AQE doesn't reach. Left side gets a random
  * salt in [0, buckets); the right side is replicated `buckets` times; the
  * join key becomes (key, salt), spreading each hot key over `buckets`
  * reducers. */
object Skew {

  /** Inner-join `left` (large, skewed) with `right` (smaller) on `keys`,
    * salted into `buckets` partitions per key. Row-level results are
    * identical to a plain inner join. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Salted aggregation: two-phase count/sum for a hot grouping key —
    * partial agg on (key, salt), final agg on key. Spark's hash aggregate
    * already does map-side partials; this is for sketch/collect aggregates
    * that would otherwise funnel a hot key through one reducer. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      partial: DataFrame => DataFrame,
      fin: DataFrame => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    fin(partial(salted).drop("__salt"))
  }
}
