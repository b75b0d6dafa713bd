package graft.sources.memjdbc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, PreparedStatement, ResultSet, ResultSetMetaData, Types}
import java.util.Properties
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Minimal in-memory JDBC engine for exercising the engine's JDBC source/
  * sink paths end-to-end in a container with no database: URL
  * `jdbc:graftmem:` — single JVM, shared static store (fine under
  * local[n]). Implements exactly the statement shapes Spark's JDBC
  * relation issues (schema probe `... WHERE 1=0`, subquery-aliased scans,
  * CREATE TABLE / INSERT batches / TRUNCATE); everything else of the huge
  * java.sql surface is satisfied by reflective proxies with benign
  * defaults. A test fixture, not a database.
  */
object MemDb {
  final case class Col(name: String, sqlType: Int)
  final case class Table(cols: Seq[Col], rows: ArrayBuffer[Array[Any]])

  val tables = new TrieMap[String, Table]()

  /** Every DDL/DML statement text, in execution order — lets specs assert
    * a sink's exact statement SEQUENCE (the stage-and-COPY contracts). */
  val journal = new ArrayBuffer[String]()

  def reset(): Unit = { tables.clear(); journal.synchronized(journal.clear()) }

  def create(name: String, cols: Seq[Col]): Unit =
    tables.put(name.toLowerCase, Table(cols, ArrayBuffer.empty))

  def seed(name: String, cols: Seq[Col], rows: Seq[Seq[Any]]): Unit = {
    create(name, cols)
    tables(name.toLowerCase).rows ++= rows.map(_.toArray)
  }

  def rowsOf(name: String): Seq[Seq[Any]] =
    tables(name.toLowerCase).rows.toSeq.map(_.toSeq)
}

/** Real class (not a proxy): Spark's DriverRegistry re-instantiates the
  * driver by reflection via its no-arg constructor. */
class MemDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(MemJdbc.UrlPrefix)
  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) MemJdbc.newConnection() else null
  override def getPropertyInfo(url: String, info: Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getLogger("memjdbc")
}

object MemJdbc {
  val UrlPrefix = "jdbc:graftmem:"

  /** Idempotent DriverManager registration. */
  lazy val register: Unit = DriverManager.registerDriver(driverProxy)

  // ---------------------------------------------------------- sql handling

  /** Resolve the table a SELECT reads: innermost `FROM <ident>` after
    * unwrapping Spark's `(...) SPARK_GEN_SUBQ_n` aliasing. */
  private def tableOf(sql: String): String = {
    var inner = sql
    val sub = """(?is).*\(\s*(.*?)\s*\)\s*SPARK_GEN_SUBQ_\d+.*""".r
    inner match { case sub(q) => inner = q; case _ => }
    val from = """(?is).*\bfrom\s+"?([A-Za-z_][A-Za-z0-9_]*)"?.*""".r
    inner match {
      case from(t) => t.toLowerCase
      case _ => throw new java.sql.SQLException(s"memjdbc cannot parse: $sql")
    }
  }

  private def isSchemaOnly(sql: String): Boolean =
    """(?is).*where\s+1\s*=\s*0\s*$""".r.matches(sql.trim)

  /** The inner user query after unwrapping Spark's subquery alias (the
    * whole sql when there is none). */
  private def innerOf(sql: String): String = {
    val sub = """(?is).*\(\s*(.*?)\s*\)\s*SPARK_GEN_SUBQ_\d+.*""".r
    sql match { case sub(q) => q; case _ => sql }
  }

  /** Evaluate the simple conjunctive numeric WHERE + single-column ORDER BY
    * shapes a stateful slice query uses (`col > N AND col <= N ORDER BY
    * col`). Anything unparseable throws — never a silently unfiltered
    * result. */
  private def applyWhereOrder(inner: String, t: MemDb.Table,
                              rows: Seq[Array[Any]]): Seq[Array[Any]] = {
    def num(v: Any): Double = v match {
      case null => Double.NaN
      case n: Number => n.doubleValue
      case s => s.toString.toDouble
    }
    val whereRe = """(?is).*?\bwhere\s+(.*?)(?:\border\s+by\b.*)?$""".r
    val filtered = inner match {
      case whereRe(conds) if conds.trim.nonEmpty =>
        val condRe = """"?([A-Za-z_][A-Za-z0-9_]*)"?\s*(>=|<=|!=|=|>|<)\s*(-?\d+(?:\.\d+)?)""".r
        val tests = conds.split("(?i)\\s+and\\s+").map(_.trim).map {
          case condRe(c, op, lit) =>
            val i = t.cols.indexWhere(_.name.equalsIgnoreCase(c))
            if (i < 0) throw new java.sql.SQLException(s"memjdbc: no column $c")
            val l = lit.toDouble
            (r: Array[Any]) => op match {
              case ">" => num(r(i)) > l
              case ">=" => num(r(i)) >= l
              case "<" => num(r(i)) < l
              case "<=" => num(r(i)) <= l
              case "=" => num(r(i)) == l
              case "!=" => num(r(i)) != l
            }
          case other => throw new java.sql.SQLException(
            s"memjdbc cannot evaluate predicate: $other")
        }
        rows.filter(r => tests.forall(_(r)))
      case _ => rows
    }
    val orderRe = """(?is).*\border\s+by\s+"?([A-Za-z_][A-Za-z0-9_]*)"?(\s+desc)?\s*$""".r
    inner match {
      case orderRe(c, desc) =>
        val i = t.cols.indexWhere(_.name.equalsIgnoreCase(c))
        if (i < 0) throw new java.sql.SQLException(s"memjdbc: no column $c")
        val asc = filtered.sortBy(r => num(r(i)))
        if (desc != null) asc.reverse else asc
      case _ => filtered
    }
  }

  /** Columns the statement projects: `*` → all. Spark quotes identifiers. */
  private def projected(sql: String, t: MemDb.Table): Seq[Int] = {
    val selectList = """(?is)\s*select\s+(.*?)\s+from\s.*""".r
    sql match {
      case selectList(cols) if !cols.trim.startsWith("*") &&
          !cols.toLowerCase.contains("select") =>
        cols.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          .map(c => t.cols.indexWhere(_.name.equalsIgnoreCase(c)))
          .filter(_ >= 0) match {
            case idx if idx.nonEmpty => idx
            case _ => t.cols.indices
          }
      case _ => t.cols.indices
    }
  }

  private val createRe =
    """(?is)\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"?([A-Za-z_][A-Za-z0-9_]*)"?\s*\((.*)\)\s*;?\s*""".r
  private val insertRe =
    """(?is)\s*insert\s+into\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*(?:\(([^)]*)\))?\s*values\s*\(.*""".r
  private val truncateRe =
    """(?is)\s*truncate\s+table\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*;?\s*""".r
  private val dropRe =
    """(?is)\s*drop\s+table\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*""".r

  private def sqlTypeOf(ddl: String): Int = ddl.trim.toUpperCase match {
    case t if t.startsWith("BIGINT") => Types.BIGINT
    case t if t.startsWith("INT") => Types.INTEGER
    case t if t.startsWith("DOUBLE") || t.startsWith("FLOAT8") => Types.DOUBLE
    case t if t.startsWith("REAL") || t.startsWith("FLOAT") => Types.FLOAT
    case t if t.startsWith("BOOLEAN") || t.startsWith("BIT") => Types.BOOLEAN
    case t if t.startsWith("TIMESTAMP") => Types.TIMESTAMP
    case t if t.startsWith("DATE") => Types.DATE
    case t if t.startsWith("DECIMAL") || t.startsWith("NUMERIC") => Types.DECIMAL
    case _ => Types.VARCHAR // TEXT, VARCHAR, CLOB, CHAR...
  }

  private def executeUpdate(sql: String): Int = {
    MemDb.journal.synchronized(MemDb.journal += sql)
    executeUpdate0(sql)
  }

  /** Warehouse statement shapes (snowflake PUT / file format / COPY INTO,
    * redshift COPY FROM) are journaled and accepted as no-ops — the fake
    * has no stage or object store; the SEQUENCE is what specs assert. */
  private def isWarehouseStmt(sql: String): Boolean = {
    val t = sql.trim.toUpperCase
    t.startsWith("PUT ") || t.startsWith("COPY ") ||
    t.startsWith("CREATE OR REPLACE TEMPORARY FILE FORMAT")
  }

  private def executeUpdate0(sql: String): Int = sql match {
    case s if isWarehouseStmt(s) => 0
    case createRe(name, colsDdl) =>
      // split on top-level commas (no nested parens in spark-generated DDL
      // beyond DECIMAL(p,s) — handle depth)
      val parts = ArrayBuffer[String]()
      var depth = 0; val cur = new StringBuilder
      colsDdl.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      if (cur.nonEmpty) parts += cur.toString
      val cols = parts.toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
        val name = p.split("\\s+").head.stripPrefix("\"").stripSuffix("\"")
        val ddl = p.split("\\s+").drop(1).mkString(" ")
        MemDb.Col(name, sqlTypeOf(ddl))
      }
      // IF NOT EXISTS must not clobber an existing table's rows
      if (!("""(?is).*if\s+not\s+exists.*""".r.matches(sql) &&
            MemDb.tables.contains(name.toLowerCase)))
        MemDb.create(name, cols)
      0
    case truncateRe(name) =>
      MemDb.tables.get(name.toLowerCase).foreach(_.rows.clear()); 0
    case dropRe(name) =>
      MemDb.tables.remove(name.toLowerCase); 0
    case _ => throw new java.sql.SQLException(s"memjdbc cannot execute: $sql")
  }

  // ------------------------------------------------------------- proxies

  private def proxy[T](iface: Class[T], h: (Method, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p.asInstanceOf[AnyRef] eq a(0))
            case "toString" => s"memjdbc-${iface.getSimpleName}"
            case _ =>
              val r = h(m, a)
              if (r != null) r
              else m.getReturnType match { // benign defaults for the rest
                case java.lang.Boolean.TYPE => Boolean.box(false)
                case java.lang.Integer.TYPE => Int.box(0)
                case java.lang.Long.TYPE => Long.box(0L)
                case _ => null
              }
          }
        }
      }).asInstanceOf[T]

  private def metaDataProxy(conn: Connection): java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData], (m, _) => m.getName match {
      case "supportsTransactions" => Boolean.box(true)
      case "supportsDataManipulationTransactionsOnly" => Boolean.box(false)
      case "supportsDataDefinitionAndDataManipulationTransactions" => Boolean.box(true)
      case "getConnection" => conn
      case "getDatabaseProductName" => "graftmem"
      case "getURL" => UrlPrefix
      case _ => null
    })

  private def rsMetaProxy(cols: Seq[MemDb.Col]): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData], (m, a) => m.getName match {
      case "getColumnCount" => Int.box(cols.size)
      case "getColumnName" | "getColumnLabel" =>
        cols(a(0).asInstanceOf[Integer] - 1).name
      case "getColumnType" => Int.box(cols(a(0).asInstanceOf[Integer] - 1).sqlType)
      case "getColumnTypeName" => "MEM"
      case "getPrecision" => Int.box(38)
      case "getScale" => Int.box(if (
        cols(a(0).asInstanceOf[Integer] - 1).sqlType == Types.DECIMAL) 10 else 0)
      case "isSigned" => Boolean.box(true)
      case "isNullable" => Int.box(ResultSetMetaData.columnNullable)
      case _ => null
    })

  private def resultSetProxy(cols: Seq[MemDb.Col], rows: Seq[Array[Any]]): ResultSet = {
    var pos = -1
    var lastNull = false
    def cell(i: Int): Any = {
      val v = rows(pos)(i - 1)
      lastNull = v == null
      v
    }
    proxy(classOf[ResultSet], (m, a) => m.getName match {
      case "next" => pos += 1; Boolean.box(pos < rows.size)
      case "close" | "clearWarnings" => null
      case "wasNull" => Boolean.box(lastNull)
      case "getMetaData" => rsMetaProxy(cols)
      case "getLong" => Long.box(cell(a(0).asInstanceOf[Integer]) match {
        case null => 0L case n: Number => n.longValue case s => s.toString.toLong })
      case "getInt" => Int.box(cell(a(0).asInstanceOf[Integer]) match {
        case null => 0 case n: Number => n.intValue case s => s.toString.toInt })
      case "getDouble" => Double.box(cell(a(0).asInstanceOf[Integer]) match {
        case null => 0.0 case n: Number => n.doubleValue case s => s.toString.toDouble })
      case "getFloat" => Float.box(cell(a(0).asInstanceOf[Integer]) match {
        case null => 0.0f case n: Number => n.floatValue case s => s.toString.toFloat })
      case "getBoolean" => Boolean.box(cell(a(0).asInstanceOf[Integer]) match {
        case null => false case b: java.lang.Boolean => b.booleanValue case _ => false })
      case "getString" => cell(a(0).asInstanceOf[Integer]) match {
        case null => null case v => v.toString }
      case "getBigDecimal" => cell(a(0).asInstanceOf[Integer]) match {
        case null => null
        case d: java.math.BigDecimal => d
        case n => new java.math.BigDecimal(n.toString) }
      case "getTimestamp" => cell(a(0).asInstanceOf[Integer]) match {
        case null => null
        case t: java.sql.Timestamp => t
        case v => java.sql.Timestamp.valueOf(v.toString) }
      case "getDate" => cell(a(0).asInstanceOf[Integer]) match {
        case null => null
        case d: java.sql.Date => d
        case v => java.sql.Date.valueOf(v.toString) }
      case "isClosed" => Boolean.box(false)
      case _ => null
    })
  }

  private def statementProxy(boundSql: String): PreparedStatement = {
    val params = new TrieMap[Int, Any]()
    val batch = ArrayBuffer[Array[Any]]()
    // PreparedStatement binds its sql at creation; plain Statement passes it
    // as the execute-call argument — accept both
    def sqlOf(a: Array[AnyRef]): String =
      if (a.nonEmpty && a(0).isInstanceOf[String]) a(0).asInstanceOf[String]
      else boundSql
    def runQuery(sql: String): ResultSet = {
      val tname = tableOf(sql)
      val t = MemDb.tables.getOrElse(tname,
        throw new java.sql.SQLException(s"no such table: $tname", "42S02"))
      val idx = projected(sql, t)
      val cols = idx.map(t.cols)
      val data =
        if (isSchemaOnly(sql)) Seq.empty
        else applyWhereOrder(innerOf(sql), t, t.synchronized(t.rows.toSeq))
          .map(r => idx.map(r).toArray)
      resultSetProxy(cols, data)
    }
    proxy(classOf[PreparedStatement], (m, a) => m.getName match {
      case "executeQuery" => runQuery(sqlOf(a))
      case "execute" =>
        val sql = sqlOf(a)
        if (sql.trim.toLowerCase.startsWith("select")) { runQuery(sql); Boolean.box(true) }
        else { executeUpdate(sql); Boolean.box(false) }
      case "executeUpdate" => Int.box(executeUpdate(sqlOf(a)))
      case n if n.startsWith("set") && a.length >= 2 &&
          a(0).isInstanceOf[Integer] && n != "setFetchSize" =>
        params.put(a(0).asInstanceOf[Integer].intValue, a(1)); null
      case "setNull" => params.put(a(0).asInstanceOf[Integer].intValue, null); null
      case "addBatch" =>
        val width = if (params.isEmpty) 0 else params.keys.max
        batch += (1 to width).map(i => params.getOrElse(i, null).asInstanceOf[Any]).toArray
        params.clear(); null
      case "executeBatch" =>
        boundSql match {
          case insertRe(tname, _) =>
            val t = MemDb.tables.getOrElse(tname.toLowerCase,
              throw new java.sql.SQLException(s"no such table: $tname", "42S02"))
            t.synchronized { t.rows ++= batch }
            val n = batch.size
            batch.clear()
            Array.fill(n)(1)
          case _ => throw new java.sql.SQLException(s"memjdbc cannot batch: $boundSql")
        }
      case "close" | "clearParameters" | "setQueryTimeout" | "setFetchSize" |
           "cancel" => null
      case "isClosed" => Boolean.box(false)
      case _ => null
    })
  }

  private def connectionProxy(): Connection = {
    lazy val conn: Connection = proxy(classOf[Connection], (m, a) => m.getName match {
      case "prepareStatement" | "createStatement" =>
        val sql = if (a.nonEmpty && a(0).isInstanceOf[String])
          a(0).asInstanceOf[String] else ""
        statementProxy(sql)
      case "getMetaData" => metaDataProxy(conn)
      case "isValid" => Boolean.box(true)
      case "getAutoCommit" => Boolean.box(true)
      case "setAutoCommit" | "commit" | "rollback" | "close" |
           "setTransactionIsolation" => null
      case "isClosed" => Boolean.box(false)
      case "getTransactionIsolation" => Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case _ => null
    })
    conn
  }

  private[memjdbc] def newConnection(): Connection = connectionProxy()

  private lazy val driverProxy: Driver = new MemDriver

  def connect(): Connection = { register; DriverManager.getConnection(UrlPrefix + "db", new Properties()) }
}
