package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Runs the PRODUCTION warehouse statement executor
  * ([[WarehouseSinks.JdbcExec]]) against embedded Derby — the closest the
  * container gets to a real warehouse JDBC endpoint. The recorder specs
  * pin the snowflake/redshift statement SEQUENCES; this pins the executor
  * itself: one session-scoped connection shared across statements, error
  * propagation, lazy reopen after close, and release on close. */
class JdbcExecDerbySpec extends AnyFunSuite {

  private def freshUrl(): String =
    s"jdbc:derby:memory:jex${java.util.UUID.randomUUID().toString.take(8)};create=true"

  test("statement sequence executes on ONE session-scoped connection") {
    val url = freshUrl()
    val exec = new WarehouseSinks.JdbcExec(url)
    try {
      // session-scoped statement sequence: a TEMPORARY table is visible
      // only to the connection that declared it — the same property the
      // snowflake TEMPORARY FILE FORMAT sequence relies on. If JdbcExec
      // opened a connection per statement, the INSERT would fail.
      exec.exec("DECLARE GLOBAL TEMPORARY TABLE session.t_tmp(v INT) " +
        "NOT LOGGED ON COMMIT PRESERVE ROWS")
      exec.exec("INSERT INTO session.t_tmp VALUES 1, 2, 3")
      exec.exec("CREATE TABLE loaded(v INT)")
      exec.exec("INSERT INTO loaded SELECT v FROM session.t_tmp")
      // verify through an INDEPENDENT connection: the permanent table is
      // committed (autocommit per statement, as in the reference)
      val c2 = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c2.createStatement().executeQuery("SELECT count(*) FROM loaded")
        rs.next()
        assert(rs.getInt(1) == 3)
      } finally c2.close()
    } finally exec.close()
  }

  test("a failing statement throws and leaves the session usable") {
    val exec = new WarehouseSinks.JdbcExec(freshUrl())
    try {
      exec.exec("CREATE TABLE ok(v INT)")
      val e = intercept[java.sql.SQLException](exec.exec("SELECT * FROM nope"))
      assert(e.getMessage.toLowerCase.contains("nope"))
      // the shared connection survives a statement failure
      exec.exec("INSERT INTO ok VALUES 7")
    } finally exec.close()
  }

  test("close releases the connection; a later exec lazily reopens") {
    val url = freshUrl()
    val exec = new WarehouseSinks.JdbcExec(url)
    exec.exec("CREATE TABLE r(v INT)")
    exec.close()
    // lazy reopen on next exec (new session, same database)
    exec.exec("INSERT INTO r VALUES 5")
    exec.close()
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT v FROM r")
      rs.next()
      assert(rs.getInt(1) == 5)
    } finally c.close()
  }
}
