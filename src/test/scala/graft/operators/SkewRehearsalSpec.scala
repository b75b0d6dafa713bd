package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rehearsal corpora must actually BE worst cases (mass duplicates /
  * one label) and the capped generators must keep them correct: star
  * compression may drop replica-replica pairs but must keep every replica
  * connected to the hub, so corpus dedup still collapses the whole
  * replica set. */
class SkewRehearsalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf)

  test("hotCorpus mass-duplicates one template over ~1/3 of documents") {
    val hot = SkewRehearsal.hotCorpus(docs)
    val n = docs.count()
    val tpl = docs.orderBy($"doc_id").limit(1).select($"text")
      .collect().head.getString(0)
    val replicas = hot.filter($"text" === tpl).count()
    assert(replicas >= n / 3, s"expected >= ${n / 3} replicas, got $replicas")
    assert(hot.count() == n, "row count must be unchanged")
  }

  test("capped minhash on the hot corpus keeps every replica connected to the hub") {
    val hot = SkewRehearsal.hotCorpus(docs).persist()
    val tpl = docs.orderBy($"doc_id").limit(1).select($"text")
      .collect().head.getString(0)
    val replicaIds = hot.filter($"text" === tpl).select($"doc_id")
      .as[Long].collect().toSet
    // cap low enough that the replica band buckets exceed it -> starred
    val pairs = NearDup.pairs(hot, maxBucket = replicaIds.size / 2)
      .select($"a_id", $"b_id").collect()
    hot.unpersist()
    // union-find over the emitted pairs: all replicas in one component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      parent(find(a)) = find(b)
    }
    val roots = replicaIds.map(find)
    assert(roots.size == 1,
      s"replica set split into ${roots.size} components under the cap")
  }

  test("hot-label cosine stays bounded and exact-within-bucket") {
    val e = SkewRehearsal.hotLabel(Tables.embeddings(spark, TestSpark.sf))
      .select($"vec_id", $"label", $"embedding")
      .withColumn("nrm", graft.functions.VectorFunctions.norm2($"embedding"))
    val n = e.count()
    // cap far below the single hot block -> LSH sub-bucketing engages
    val pairs = Blocking.boundedCosinePairs(e, maxBlock = n / 4)
    val cnt = pairs.count()
    // sub-bucketing must cut the pair space well below all-pairs
    assert(cnt > 0 && cnt < n * (n - 1) / 2,
      s"expected bounded pair count, got $cnt of ${n * (n - 1) / 2}")
  }
}
