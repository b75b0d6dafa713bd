package graft.sources

import graft.TestSpark
import graft.plans.{IncrementalRunner, StateStore, StatefulQuery}
import graft.sources.memjdbc.{MemDb, MemJdbc}
import java.sql.Types
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the engine's JDBC source/sink code through Spark's REAL JDBC
  * relation (driver registration, schema probe, typed getters, batched
  * inserts) against the in-memory [[MemJdbc]] engine — the container has
  * no database, but the wire path this engine shares with S2/S3/D1-D3 is
  * fully driven end-to-end here. */
class MemJdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = MemJdbc.UrlPrefix + "db"

  test("jdbc source: full user-query pushdown with typed columns and nulls") {
    MemJdbc.register
    MemDb.seed("people",
      Seq(MemDb.Col("id", Types.BIGINT), MemDb.Col("name", Types.VARCHAR),
          MemDb.Col("score", Types.DOUBLE)),
      Seq(Seq(1L, "ada", 9.5), Seq(2L, "lin", 7.0), Seq(3L, null, 1.25)))
    val df = Sources.jdbc(spark, url, "SELECT * FROM people",
      origin = Some("people"))
    assert(df.columns.toSeq == Seq("id", "name", "score", "origin"))
    val rows = df.select("id", "name", "score").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) == "ada" && rows(2).isNullAt(1))
    assert(rows(1).getDouble(2) == 7.0)
  }

  test("stateful slice executes ON the source — the reference's pushdown model") {
    MemJdbc.register
    MemDb.seed("src_rows",
      Seq(MemDb.Col("id", Types.BIGINT), MemDb.Col("v", Types.VARCHAR)),
      (1L to 10L).map(i => Seq[Any](i, s"v$i")))
    val sq = StatefulQuery("SELECT id, v FROM src_rows WHERE id > $id::i64 ORDER BY id")
    val slice = Sources.jdbc(spark, url, sq.bind(4))
    assert(slice.select("id").as[Long].collect().toSeq == (5L to 10L))
  }

  test("IncrementalRunner drives watermark ticks through a live jdbc source") {
    MemJdbc.register
    MemDb.seed("inc_rows",
      Seq(MemDb.Col("id", Types.BIGINT), MemDb.Col("v", Types.VARCHAR)),
      (1L to 6L).map(i => Seq[Any](i, s"v$i")))
    val store = new StateStore(
      java.nio.file.Files.createTempDirectory("memjdbc_state").toString)
    val runner = new IncrementalRunner(spark, store)
    val sq = StatefulQuery("SELECT id, v FROM inc_rows WHERE id > $id::i64 ORDER BY id")
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def drive(): Long = runner.catchUp("p1", "src", sq,
      sql => Sources.jdbc(spark, url, sql),
      df => seen ++= df.select("id").as[Long].collect())
    assert(drive() == 6L)
    assert(seen.sorted.toSeq == (1L to 6L))
    // rows arrive AFTER the first catch-up: only the delta is processed
    MemDb.tables("inc_rows").rows ++= (7L to 8L).map(i => Array[Any](i, s"v$i"))
    assert(drive() == 8L)
    assert(seen.sorted.toSeq == (1L to 8L), "replayed already-acked rows")
  }

  test("jdbc sink: create + batched insert through Spark's write path") {
    MemJdbc.register
    MemDb.tables.remove("out_t")
    val df = Seq((1L, "x", 2.5), (2L, "y", 0.5)).toDF("id", "v", "w")
    Sinks.jdbc(df.coalesce(1), url, "out_t")
    val got = MemDb.rowsOf("out_t").map(r =>
      (r(0).asInstanceOf[Long], r(1).toString, r(2).asInstanceOf[Double])).toSet
    assert(got == Set((1L, "x", 2.5), (2L, "y", 0.5)))
    // append again: no truncate → rows accumulate
    Sinks.jdbc(df.coalesce(1), url, "out_t")
    assert(MemDb.rowsOf("out_t").size == 4)
  }

  test("jdbc by-origin fan-out creates one table per origin (D1-D3 routing)") {
    MemJdbc.register
    MemDb.tables.remove("t_a"); MemDb.tables.remove("t_b")
    val multi = Seq(("t_a", 1L), ("t_b", 2L), ("t_a", 3L)).toDF("origin", "id")
    Sinks.jdbcByOrigin(multi.coalesce(1), url)
    assert(MemDb.rowsOf("t_a").map(_(0).asInstanceOf[Long]).sorted == Seq(1L, 3L))
    assert(MemDb.rowsOf("t_b").map(_(0).asInstanceOf[Long]) == Seq(2L))
  }
}
