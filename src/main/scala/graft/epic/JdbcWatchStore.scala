package graft.epic

import java.sql.{Connection, ResultSet, SQLException, Timestamp}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JDBC-backed watch store — reference parity with `epic_watchdog` living
  * in PostgreSQL behind transactional guards (epic_orm/
  * pg_pixel_storage.py:56-74,96-125). Use this instead of the parquet
  * [[WatchStore]] the day the watchlist becomes shared infrastructure: the
  * parquet store's JVM-wide lock is correct for ONE driver, while here
  * duplicate-guard + id assignment + insert run inside one exclusive
  * transaction, so concurrent drivers (or an external tool speaking SQL to
  * the same table) cannot lose adds or mint duplicate ids.
  *
  * Control-plane shape (deliberate, same as the parquet store): the
  * watchlist is tiny and broadcasts into the hot path, so reads are plain
  * driver-side JDBC materialized into a local DataFrame — no executor
  * connections, no dialect-specific pushdown to get wrong. Connection
  * failures retry with the same linear-backoff loop as the data-plane
  * [[JdbcSink]].
  */
class JdbcWatchStore(protected val spark: SparkSession, url: String,
    table: String = "epic_watchdog", user: String = "", password: String = "",
    maxRetries: Int = 3, retryDelayMs: Long = 100)
    extends WatchStoreApi {

  import WatchStore.schema

  ensureTable()

  private def withConnection[T](f: Connection => T): T = {
    var attempt = 0
    while (true) {
      val conn = JdbcSink.connect(url, user, password)
      try {
        val r = f(conn)
        if (!conn.getAutoCommit) conn.commit()
        return r
      } catch {
        case e: SQLException =>
          try { if (!conn.getAutoCommit) conn.rollback() }
          catch { case _: Exception => }
          attempt += 1
          if (attempt > maxRetries || !isTransient(e)) throw e
          Thread.sleep(retryDelayMs * attempt)
        case e: Throwable =>
          // non-SQL failures (e.g. the duplicate-watch guard) must still
          // roll back: Derby refuses to close a connection with an open
          // transaction, and a swallowed close failure would leave the
          // exclusive table lock held forever
          try { if (!conn.getAutoCommit) conn.rollback() }
          catch { case _: Exception => }
          throw e
      } finally {
        try conn.close() catch { case _: Exception => }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retry only connection-grade failures; logic errors (duplicate watch,
    * constraint violations) must propagate on the first attempt. */
  private def isTransient(e: SQLException): Boolean = {
    val state = Option(e.getSQLState).getOrElse("")
    // 08xxx = connection exception (SQL standard), 40xxx = rollback/
    // serialization failure — both worth a fresh connection
    state.startsWith("08") || state.startsWith("40")
  }

  private def ensureTable(): Unit = withConnection { conn =>
    val ddl =
      s"""CREATE TABLE $table (
         |  id BIGINT NOT NULL PRIMARY KEY,
         |  source_name VARCHAR(256) NOT NULL,
         |  ra DOUBLE NOT NULL,
         |  "dec" DOUBLE NOT NULL,
         |  author VARCHAR(256),
         |  event_time TIMESTAMP,
         |  t_start TIMESTAMP,
         |  t_end TIMESTAMP,
         |  reason VARCHAR(2048),
         |  watch_mode VARCHAR(32),
         |  patch_type VARCHAR(32),
         |  event_type VARCHAR(256),
         |  watch_status VARCHAR(32),
         |  voevent VARCHAR(32000))""".stripMargin
    val st = conn.createStatement()
    try st.executeUpdate(ddl)
    catch {
      // "table already exists" — Derby X0Y32, PG 42P07; anything else is real
      case e: SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" =>
    } finally st.close()
  }

  override def listAll(): DataFrame = withConnection { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT id, source_name, ra, "dec", author, event_time, t_start, """ +
          s"t_end, reason, watch_mode, patch_type, event_type, " +
          s"watch_status, voevent FROM $table ORDER BY id")
      val rows = new ArrayBuffer[Row]()
      while (rs.next()) rows += rowOf(rs)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    } finally st.close()
  }

  private def rowOf(rs: ResultSet): Row = Row(
    rs.getLong(1), rs.getString(2), rs.getDouble(3), rs.getDouble(4),
    rs.getString(5), rs.getTimestamp(6), rs.getTimestamp(7),
    rs.getTimestamp(8), rs.getString(9), rs.getString(10),
    rs.getString(11), rs.getString(12), rs.getString(13), rs.getString(14))

  /** Duplicate guard + max(id)+1 + insert as ONE exclusive transaction —
    * the transactional insert-returning the reference gets from Postgres
    * (pg_pixel_storage.py:96-125). The exclusive table lock serializes
    * concurrent adders across PROCESSES, which no JVM lock can. */
  override protected def insertWatch(row: Row): Long = withConnection { conn =>
    conn.setAutoCommit(false)
    lockTableExclusive(conn)
    val sourceName = row.getString(1)
    val guard = conn.prepareStatement(
      s"SELECT COUNT(*) FROM $table WHERE source_name = ? " +
        "AND watch_status = 'watching'")
    val dup =
      try {
        guard.setString(1, sourceName)
        val rs = guard.executeQuery(); rs.next(); rs.getLong(1)
      } finally guard.close()
    if (dup > 0) throw new IllegalStateException(
      s"source '$sourceName' is already being watched")
    val idSt = conn.createStatement()
    val nextId =
      try {
        val rs = idSt.executeQuery(
          s"SELECT COALESCE(MAX(id), 0) + 1 FROM $table")
        rs.next(); rs.getLong(1)
      } finally idSt.close()
    val ins = conn.prepareStatement(
      s"""INSERT INTO $table (id, source_name, ra, "dec", author, event_time, """ +
        "t_start, t_end, reason, watch_mode, patch_type, event_type, " +
        "watch_status, voevent) VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?)")
    try {
      ins.setLong(1, nextId)
      ins.setString(2, sourceName)
      ins.setDouble(3, row.getDouble(2))
      ins.setDouble(4, row.getDouble(3))
      ins.setString(5, row.getString(4))
      ins.setTimestamp(6, row.getAs[Timestamp](5))
      ins.setTimestamp(7, row.getAs[Timestamp](6))
      ins.setTimestamp(8, row.getAs[Timestamp](7))
      ins.setString(9, row.getString(8))
      ins.setString(10, row.getString(9))
      ins.setString(11, row.getString(10))
      ins.setString(12, row.getString(11))
      ins.setString(13, row.getString(12))
      ins.setString(14, row.getString(13))
      ins.executeUpdate()
    } finally ins.close()
    nextId
  }

  /** Best-effort exclusive lock: Derby spells it LOCK TABLE … IN EXCLUSIVE
    * MODE, PostgreSQL LOCK TABLE … IN ACCESS EXCLUSIVE MODE; a backend
    * that supports neither still gets guard+insert in one transaction
    * (serializable isolation is then the deployment's job). */
  private def lockTableExclusive(conn: Connection): Unit = {
    val st = conn.createStatement()
    try st.execute(s"LOCK TABLE $table IN EXCLUSIVE MODE")
    catch {
      case _: SQLException =>
        try st.execute(s"LOCK TABLE $table IN ACCESS EXCLUSIVE MODE")
        catch { case _: SQLException => }
    } finally st.close()
  }

  /** M2 as one UPDATE — the set-based form of the parquet store's rewrite;
    * returns the flipped count. */
  override def expireDue(now: Timestamp): Long = withConnection { conn =>
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement(
      s"UPDATE $table SET watch_status = 'watched' " +
        "WHERE watch_status = 'watching' AND t_end <= ?")
    try {
      ps.setTimestamp(1, now)
      ps.executeUpdate().toLong
    } finally ps.close()
  }
}
