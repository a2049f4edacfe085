package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSetMetaData, SQLException, Types}
import java.util.Properties
import java.util.logging.Logger

import scala.collection.mutable

/** In-process fake JDBC driver for exercising the real Spark JDBC
  * write path (JdbcRelationProvider → JdbcUtils.saveTable →
  * per-partition batched inserts) with zero egress. Connections,
  * statements, result sets and metadata are reflective proxies that
  * answer the calls JdbcUtils makes — existence probe, CREATE/DROP
  * DDL, schema probe (ResultSetMetaData parsed back from the CREATE
  * TABLE statement), batched INSERTs — and record everything into
  * [[FakeJdbcStore]]; other methods return type-appropriate
  * defaults. */
object FakeJdbcStore {
  val URL = "jdbc:graftfake://mem"

  final case class TableState(columns: Vector[(String, String)],
      rows: mutable.ArrayBuffer[Vector[Any]] = mutable.ArrayBuffer())

  private val lock = new Object
  val ddl = mutable.ArrayBuffer[String]()
  val tables = mutable.LinkedHashMap[String, TableState]()

  def clear(): Unit = lock.synchronized { ddl.clear(); tables.clear() }
  def dropTable(name: String): Unit = lock.synchronized { tables.remove(name) }
  def exists(name: String): Boolean = lock.synchronized { tables.contains(name) }
  def insert(name: String, rows: Seq[Vector[Any]]): Unit =
    lock.synchronized { tables(name).rows ++= rows }
  def rows(name: String): Vector[Vector[Any]] =
    lock.synchronized { tables.get(name).map(_.rows.toVector).getOrElse(Vector()) }
  def columnsOf(name: String): Vector[(String, String)] =
    lock.synchronized { tables.get(name).map(_.columns).getOrElse(Vector()) }
  def recordDdl(sql: String): Unit = lock.synchronized { ddl += sql }
  def ddlSnapshot: Vector[String] = lock.synchronized { ddl.toVector }

  /** Parse `CREATE TABLE t ("c1" TYPE [NOT NULL], ...)` back into
    * (name, type) pairs — the schema the metadata probe serves. */
  private def createTableFromDdl(sql: String): Unit = {
    val name = tableOf(sql, "(?i)CREATE TABLE\\s+\"?([\\w.]+)\"?")
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val cols = body.split(",").toVector.map(_.trim).filter(_.nonEmpty).map {
      colDef =>
        val m = "\"?([\\w]+)\"?\\s+([\\w()]+)".r.findFirstMatchIn(colDef)
          .getOrElse(throw new SQLException(s"cannot parse column: $colDef"))
        (m.group(1), m.group(2).toUpperCase)
    }
    lock.synchronized { tables(name) = TableState(cols) }
  }

  private def sqlTypeOf(typeName: String): Int = typeName match {
    case "BIGINT" => Types.BIGINT
    case "INTEGER" => Types.INTEGER
    case "SMALLINT" => Types.SMALLINT
    case "DOUBLE" => Types.DOUBLE
    case t if t.startsWith("FLOAT") || t == "REAL" => Types.FLOAT
    case t if t.startsWith("DECIMAL") || t.startsWith("NUMERIC") =>
      Types.DECIMAL
    case "BIT" | "BOOLEAN" => Types.BIT
    case "DATE" => Types.DATE
    case "TIMESTAMP" => Types.TIMESTAMP
    case "BLOB" | "BINARY" => Types.BINARY
    case _ => Types.VARCHAR // TEXT and friends
  }

  private def tableOf(sql: String, pattern: String): String =
    pattern.r.findFirstMatchIn(sql).map(_.group(1)).getOrElse(
      throw new SQLException(s"fake driver cannot parse table from: $sql"))

  private def proxy[T](iface: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T = {
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
        val a = if (args == null) Array.empty[AnyRef] else args
        if (handle.isDefinedAt((m.getName, a))) handle((m.getName, a))
        else m.getName match {
          case "toString" => s"fake-${iface.getSimpleName}"
          case "hashCode" => Int.box(System.identityHashCode(p))
          case "equals" => Boolean.box(p.asInstanceOf[AnyRef] eq a(0))
          case _ => defaultFor(m.getReturnType)
        }
      }
    }
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), h)
      .asInstanceOf[T]
  }

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => Boolean.box(false)
    case java.lang.Integer.TYPE => Int.box(0)
    case java.lang.Long.TYPE => Long.box(0L)
    case java.lang.Short.TYPE => Short.box(0)
    case java.lang.Byte.TYPE => Byte.box(0)
    case java.lang.Double.TYPE => Double.box(0.0)
    case java.lang.Float.TYPE => Float.box(0.0f)
    case java.lang.Character.TYPE => Char.box(' ')
    case java.lang.Void.TYPE => null
    case c if c == classOf[String] => ""
    case _ => null
  }

  /** Zero-row result set whose metadata reflects the table's columns
    * — serves both the existence probe and Spark's schema probe
    * (`SELECT * FROM t WHERE 1=0` → getMetaData). */
  private def schemaResultSet(table: String): java.sql.ResultSet = {
    val cols = columnsOf(table)
    val md = proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(cols.size)
      case ("getColumnName" | "getColumnLabel", Array(i: Integer)) =>
        cols(i - 1)._1
      case ("getColumnType", Array(i: Integer)) =>
        Int.box(sqlTypeOf(cols(i - 1)._2))
      case ("getColumnTypeName", Array(i: Integer)) => cols(i - 1)._2
      case ("isNullable", _) => Int.box(ResultSetMetaData.columnNullable)
      case ("isSigned", _) => Boolean.box(true)
      case ("getPrecision", _) => Int.box(38)
      case ("getScale", _) => Int.box(6)
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => Boolean.box(false)
      case ("getMetaData", _) => md
      case ("close", _) => null
    }
  }

  /** PreparedStatement for an INSERT: setters fill the current row,
    * addBatch queues it, executeBatch commits to the store. */
  private def insertStatement(table: String): java.sql.PreparedStatement = {
    val current = mutable.Map[Int, Any]()
    val batch = mutable.ArrayBuffer[Vector[Any]]()
    def rowOf(m: mutable.Map[Int, Any]): Vector[Any] = {
      val n = if (m.isEmpty) 0 else m.keys.max
      (1 to n).map(i => m.getOrElse(i, null)).toVector
    }
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setNull", a) if a.nonEmpty =>
        current(a(0).asInstanceOf[Integer].intValue) = null; null
      case ("setQueryTimeout", _) => null
      case (name, a) if name.startsWith("set") && a.length == 2 &&
          a(0).isInstanceOf[Integer] =>
        current(a(0).asInstanceOf[Integer].intValue) = a(1); null
      case ("addBatch", a) if a.isEmpty =>
        batch += rowOf(current); current.clear(); null
      case ("executeBatch", _) =>
        insert(table, batch.toSeq)
        val res = Array.fill(batch.size)(1)
        batch.clear(); res
      case ("executeUpdate", a) if a.isEmpty =>
        insert(table, Seq(rowOf(current))); current.clear(); Int.box(1)
      case ("close", _) => null
    }
  }

  private def statement: java.sql.Statement =
    proxy(classOf[java.sql.Statement]) {
      case ("executeUpdate", Array(sql: String)) =>
        recordDdl(sql)
        val up = sql.trim.toUpperCase
        if (up.startsWith("CREATE TABLE")) createTableFromDdl(sql)
        else if (up.startsWith("DROP TABLE"))
          dropTable(tableOf(sql, "(?i)DROP TABLE\\s+\"?([\\w.]+)\"?"))
        Int.box(0)
      case ("setQueryTimeout", _) => null
      case ("close", _) => null
    }

  def connection: Connection = proxy(classOf[Connection]) {
    case ("prepareStatement", Array(sql: String, _*)) =>
      val up = sql.trim.toUpperCase
      if (up.startsWith("INSERT"))
        insertStatement(tableOf(sql, "(?i)INSERT INTO\\s+\"?([\\w.]+)\"?"))
      else {
        // existence / schema probe: "SELECT * FROM t WHERE 1=0"
        val t = tableOf(sql, "(?i)FROM\\s+\"?([\\w.]+)\"?")
        proxy(classOf[java.sql.PreparedStatement]) {
          case ("executeQuery", _) =>
            if (exists(t)) schemaResultSet(t)
            // SQLState 42S02 (table not found): Spark's dialect only
            // treats states starting with "42" as object-not-found;
            // anything else is rethrown from tableExists
            else throw new SQLException(s"table $t does not exist", "42S02")
          case ("setQueryTimeout", _) => null
          case ("close", _) => null
        }
      }
    case ("createStatement", _) => statement
    case ("getMetaData", _) =>
      proxy(classOf[java.sql.DatabaseMetaData]) {
        case ("supportsBatchUpdates", _) => Boolean.box(true)
        case ("getIdentifierQuoteString", _) => "\""
      }
    case ("isClosed", _) => Boolean.box(false)
    case ("getAutoCommit", _) => Boolean.box(true)
    case ("close" | "commit" | "rollback" | "setAutoCommit" |
          "setTransactionIsolation", _) => null
  }
}

/** Registered by class name via Spark's `driver` option — must be a
  * top-level class with a no-arg constructor. */
class FakeJdbcDriver extends Driver {
  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) FakeJdbcStore.connection else null
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftfake:")
  override def getPropertyInfo(url: String,
      info: Properties): Array[DriverPropertyInfo] = Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
