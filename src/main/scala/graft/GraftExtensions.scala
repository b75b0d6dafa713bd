package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-deploy entry point for graft's custom planner + SQL-function
  * surface — the idiomatic registration path the ad-hoc API can't give
  * you:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects [[graft.plans.TopKStrategy]] at session build on every node of
  * the cluster, so `TopKPerKeyPlan` nodes plan to their bounded-heap
  * physical operator without any runtime session mutation
  * ([[graft.plans.TopKPerKey.apply]] also self-registers through
  * `experimental.extraStrategies` for ad-hoc sessions; both paths are
  * idempotent and coexist) — and registers the
  * [[graft.functions.GraftFunctions]] catalog, so every session on the
  * cluster can call `graft_langid` / `graft_simhash` /
  * `graft_unigram_tokens(text, store)` / … straight from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    graft.functions.GraftFunctions.functions.foreach(ext.injectFunction)
  }
}
