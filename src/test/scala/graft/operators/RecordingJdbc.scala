package graft.operators

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, PreparedStatement, ResultSet, Statement}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** In-memory recording JDBC driver (`jdbc:graftrecord:`) — the wire-format
  * witness for the Postgres sink path that the sandbox can never execute
  * for real (no Postgres driver jar ships in /opt/spark/jars; Derby covers
  * the EXECUTED tests). Every `prepareStatement` / bind / batch / commit
  * the sink issues is recorded verbatim, so IdempotentAppendWireSpec can
  * assert the exact `INSERT … ON CONFLICT DO NOTHING` statements, bind
  * arity and flush protocol a real Postgres server would receive.
  *
  * Implementation: `java.lang.reflect.Proxy` over the JDBC interfaces,
  * handling only the methods the sink uses (everything else throws — a
  * new sink dependency on an unrecorded call fails loudly instead of
  * silently vanishing from the record). Batch execs answer
  * `SUCCESS_NO_INFO` or real counts per [[RecordingJdbc.noInfoMode]] —
  * both count-protocol branches of `insertedFromBatch` are drivable.
  * Events are tagged with a per-connection serial: executors open one
  * connection per non-empty partition, possibly concurrently, so specs
  * assert per-connection sequences, not global order. */
object RecordingJdbc {
  val UrlPrefix = "jdbc:graftrecord:"

  /** (connection serial, event kind, payload). Kinds: setAutoCommit,
    * prepare, executeBatch (payload = sql + bound rows), executeQuery
    * (payload = sql + params), commit, close. */
  final case class Ev(conn: Int, kind: String, sql: String,
      rows: Vector[Vector[Any]])

  private val events = new ConcurrentLinkedQueue[Ev]()
  private val connSerial = new AtomicInteger(0)
  /** Batch results: true ⇒ every statement answers SUCCESS_NO_INFO (the
    * Postgres `reWriteBatchedInserts` shape), false ⇒ per-row count 1. */
  @volatile var noInfoMode: Boolean = true
  /** Answer every `SELECT COUNT(*) … IN (…)` probe with this count. */
  @volatile var existingCount: Long = 0L

  def reset(noInfo: Boolean, existing: Long): Unit = {
    events.clear(); connSerial.set(0)
    noInfoMode = noInfo; existingCount = existing
  }
  def recorded: Vector[Ev] = {
    val it = events.iterator(); val b = Vector.newBuilder[Ev]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def proxy[T](clazz: Class[T])(
      h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            // java.lang.Object plumbing (DriverManager toString-s the
            // driver on registration) — answered, never recorded
            case "toString" => s"graftrecord:${clazz.getSimpleName}"
            case "hashCode" => Integer.valueOf(System.identityHashCode(p))
            case "equals" => java.lang.Boolean.valueOf(p eq args(0))
            case name => h(name, if (args == null) Array.empty else args)
          }
      }).asInstanceOf[T]

  private def countResultSet(n: Long): ResultSet =
    proxy(classOf[ResultSet]) {
      case ("next", _) => java.lang.Boolean.TRUE
      case ("getLong", _) => java.lang.Long.valueOf(n)
      case ("close" | "wasNull", _) => null
      case (other, _) => sys.error(s"unrecorded ResultSet.$other")
    }

  private def statement(conn: Int, sql: String): PreparedStatement = {
    val params = scala.collection.mutable.TreeMap.empty[Int, Any]
    val batch = Vector.newBuilder[Vector[Any]]
    var batchSize = 0
    proxy(classOf[PreparedStatement]) {
      case ("setObject", a) =>
        params(a(0).asInstanceOf[Integer].intValue) = a(1); null
      case ("addBatch", _) =>
        batch += params.values.toVector; params.clear(); batchSize += 1; null
      case ("executeBatch", _) =>
        val rows = batch.result()
        events.add(Ev(conn, "executeBatch", sql, rows))
        batch.clear(); val n = batchSize; batchSize = 0
        Array.fill(n)(if (noInfoMode) Statement.SUCCESS_NO_INFO else 1)
      case ("executeQuery", _) =>
        events.add(Ev(conn, "executeQuery", sql, Vector(params.values.toVector)))
        params.clear(); countResultSet(existingCount)
      case ("close", _) => null
      case (other, _) => sys.error(s"unrecorded PreparedStatement.$other")
    }
  }

  private def connection(): Connection = {
    val serial = connSerial.incrementAndGet()
    proxy(classOf[Connection]) {
      case ("setAutoCommit", a) =>
        events.add(Ev(serial, "setAutoCommit", a(0).toString, Vector.empty)); null
      case ("prepareStatement", a) =>
        val sql = a(0).asInstanceOf[String]
        events.add(Ev(serial, "prepare", sql, Vector.empty))
        statement(serial, sql)
      case ("commit", _) => events.add(Ev(serial, "commit", "", Vector.empty)); null
      case ("close", _) => events.add(Ev(serial, "close", "", Vector.empty)); null
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case (other, _) => sys.error(s"unrecorded Connection.$other")
    }
  }

  private val driver: Driver = proxy(classOf[Driver]) {
    case ("connect", a) =>
      val url = a(0).asInstanceOf[String]
      if (url != null && url.startsWith(UrlPrefix)) connection() else null
    case ("acceptsURL", a) =>
      java.lang.Boolean.valueOf(
        a(0).asInstanceOf[String].startsWith(UrlPrefix))
    case ("getMajorVersion", _) => Integer.valueOf(1)
    case ("getMinorVersion", _) => Integer.valueOf(0)
    case ("jdbcCompliant", _) => java.lang.Boolean.FALSE
    case (other, _) => sys.error(s"unrecorded Driver.$other")
  }

  /** Idempotent: DriverManager tolerates duplicate registration attempts
    * but we guard anyway to keep the driver list clean across suites. */
  private lazy val registered: Unit = DriverManager.registerDriver(driver)
  def ensureRegistered(): Unit = registered
}
