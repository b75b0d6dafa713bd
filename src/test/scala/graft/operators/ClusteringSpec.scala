package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 maxDriverEdges: Long): Map[Long, Long] =
    Clustering.connectedComponents(
        nodes.toDF("id"), edges.toDF("a", "b"), maxDriverEdges)
      .as[(Long, Long)].collect().toMap

  private val nodes = (0L to 40L)
  // a 31-node path (diameter 30 — beyond any small iteration cap), a
  // triangle, an extra edge with multiplicity, and isolated nodes 36-40
  private val edges =
    (0L until 30L).map(i => (i, i + 1)) ++
    Seq((33L, 34L), (34L, 35L), (35L, 33L), (33L, 34L))

  private val expected =
    (0L to 30L).map(_ -> 0L) ++
    Seq(31L -> 31L, 32L -> 32L) ++
    (33L to 35L).map(_ -> 33L) ++
    (36L to 40L).map(i => i -> i)

  test("driver union-find path labels min-id per component") {
    assert(cc(nodes, edges, maxDriverEdges = 1000000L) == expected.toMap)
  }

  test("distributed large/small-star path agrees, beyond a 20-round diameter") {
    assert(cc(nodes, edges, maxDriverEdges = 0L) == expected.toMap)
  }

  test("large/small-star converges in O(log n) rounds on the 31-node path") {
    val (labels, rounds) = Clustering.largeSmallStarCC(
      (0L to 30L).toDF("id"),
      (0L until 30L).map(i => (i, i + 1)).toDF("a", "b"),
      maxIters = 100)
    assert(labels.as[(Long, Long)].collect().toMap ==
      (0L to 30L).map(_ -> 0L).toMap)
    // diameter 30 would cost ~30 min-label rounds; star alternation must
    // do it in ~log2(31)+2 = 7 — the property that makes long chains
    // affordable at corpus scale
    assert(rounds <= 7, s"expected <= ~ceil(log2 31)+2 rounds, took $rounds")
  }

  test("large/small-star agrees with driver union-find on random graphs") {
    // seeded LCG so the graphs are reproducible; shapes cover sparse
    // forests, mid-density, and near-complete components
    var state = 42L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 1 to 5) {
      val n = 20 + nextInt(30)
      val nEdges = nextInt(2 * n)
      val nodes = (0L until n.toLong)
      val edges = (1 to nEdges).map(_ =>
        (nextInt(n).toLong, nextInt(n).toLong)).filter(e => e._1 != e._2)
      val viaUnionFind = cc(nodes, edges, maxDriverEdges = 1000000L)
      val viaStars = cc(nodes, edges, maxDriverEdges = 0L)
      assert(viaStars == viaUnionFind,
        s"trial $trial (n=$n, edges=${edges.size}): star labels diverge")
    }
  }

  test("distributed path fails loudly instead of returning unconverged labels") {
    val e = intercept[IllegalStateException] {
      Clustering.connectedComponents(
        (0L to 400L).toDF("id"),
        (0L until 400L).map(i => (i, i + 1)).toDF("a", "b"),
        maxDriverEdges = 0L, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("representatives: highest score wins, ties break to lowest id, singletons kept") {
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (7L, 0.1))
      .toDF("id", "score")
    val got = Clustering.representatives(members, scores)
      .as[(Long, Long, Double, Long)].collect().toSet
    // cluster 1: ids 2 and 3 tie at 0.9 → lowest id (2) wins, 3 members;
    // singleton 7 represents itself
    assert(got == Set((1L, 2L, 0.9, 3L), (7L, 7L, 0.1, 1L)))
  }

  test("pageRank: hub outranks leaves outrank isolated; partition-invariant") {
    // star 1-{2,3,4}, pair 5-6, isolated 7
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 5L))
      .toDF("a", "b") // duplicate/reversed pair edge collapses
    val pr = Clustering.pageRank(nodes, edges, iters = 5)
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (id, r) => id -> r.doubleValue() }.toMap
    // isolated node receives no inflow: exactly (1-d)/N every iteration
    assert(pr(7L) == math.rint(0.15 / 7 * 1e6) / 1e6)
    assert(pr(1L) > pr(2L), s"hub ${pr(1L)} must outrank leaf ${pr(2L)}")
    assert(pr(2L) > pr(7L), s"leaf ${pr(2L)} must outrank isolated ${pr(7L)}")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L), "symmetric leaves must tie")
    // no dangling-mass redistribution (documented): isolated nodes leak
    // their share each iteration, so total mass sits strictly BELOW 1 but
    // above the teleport floor (1-d)
    assert(pr.values.sum <= 1.0 + 1e-6 && pr.values.sum > 0.15,
      s"total mass ${pr.values.sum} outside ((1-d), 1]")
    // the fixed rounding points make the result partition-independent
    val pr1 = Clustering.pageRank(nodes.repartition(1),
      edges.toDF("a", "b").repartition(1), iters = 5)
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (id, r) => id -> r.doubleValue() }.toMap
    assert(pr1 == pr, "partitioning changed pageRank values")
  }

  test("pageRank: bit-identical across sessions, partitionings, and runs") {
    // the engine-exactness claim (integer micro-unit arithmetic, no
    // double/decimal division) demands BIT-identical ranks regardless of
    // shuffle-partition count, input partitioning, or run repetition —
    // compare BigDecimal unscaled longs, not doubles
    val docs = spark.read
      .parquet(s"${graft.TestSpark.sf}/documents.parquet")
      .select($"doc_id".as("id"))
    val pairs = NearDup.pairs(spark.read
        .parquet(s"${graft.TestSpark.sf}/documents.parquet"))
      .select($"a_id".as("a"), $"b_id".as("b"))
    def run(sess: org.apache.spark.sql.SparkSession,
            parts: Int): Seq[(Long, java.math.BigInteger)] = {
      val n = sess.createDataFrame(docs.collect().toSeq.asJava, docs.schema)
        .repartition(parts)
      val e = sess.createDataFrame(pairs.collect().toSeq.asJava, pairs.schema)
        .repartition(parts)
      val out = Clustering.pageRank(n, e, iters = 5)
        .as[(Long, java.math.BigDecimal)](
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.DECIMAL))
        .collect().sortBy(_._1).toSeq
      sess.catalog.clearCache()
      out.map { case (id, r) => (id, r.unscaledValue()) }
    }
    val s4 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "4")
    val s32 = spark.newSession()
    s32.conf.set("spark.sql.shuffle.partitions", "32")
    val runs = Seq(run(s4, 1), run(s4, 7), run(s32, 32))
    assert(runs.forall(_ == runs.head),
      "pageRank ranks are not bit-identical across sessions/partitionings")
  }

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add); l
    }
  }
}
