package graft.epic

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** JDBC append sink — the production swap for the dual-parquet default
  * (S5). Semantics from the reference's service hub
  * (service_hub.py:49-64,102-115): batched executemany-style inserts
  * (`batchSize` rows per executeBatch), and on failure the connection is
  * torn down, reopened, and the in-flight batch replayed (`maxRetries`
  * attempts with linear backoff) — the psycopg2 reconnect loop.
  *
  * Scale shape: runs executor-side via foreachPartition, ONE connection
  * per partition for its whole lifetime — a 1000-executor cluster presents
  * O(cores) connections, never O(rows). Only sink-boundary-formatted
  * frames should pass through here (EpicPipeline.toPgStrings /
  * metaToPgStrings): structs/arrays become PG literals first, so every
  * cell is a plain JDBC scalar.
  */
class JdbcSink(url: String, user: String = "", password: String = "",
    batchSize: Int = 500, maxRetries: Int = 3, retryDelayMs: Long = 100)
    extends Serializable {

  /** Append every row of `df` into `table` (columns by name, in the
    * frame's order). Throws if a batch still fails after maxRetries. */
  def append(df: DataFrame, table: String): Unit = {
    val cols = df.schema.fieldNames
    val sql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val (u, usr, pw) = (url, user, password)
    val (bs, mr, rd) = (batchSize, maxRetries, retryDelayMs)
    df.foreachPartition((rows: Iterator[Row]) =>
      JdbcSink.writePartition(u, usr, pw, sql, rows, bs, mr, rd))
  }
}

object JdbcSink {

  private[epic] def connect(url: String, user: String, pw: String): Connection = {
    val c =
      if (user.isEmpty) DriverManager.getConnection(url)
      else DriverManager.getConnection(url, user, pw)
    // each executeBatch commits as ONE transaction: without this, JDBC's
    // default autocommit could persist a prefix of a batch that fails
    // mid-way, and the reconnect-replay would then duplicate those rows
    // (the reference's to_sql path is transactional for the same reason)
    try c.setAutoCommit(false)
    catch { case _: SQLException => } // driver without txn support
    c
  }

  /** Executor-side batch loop: group rows, insert each group in one
    * executeBatch committed as one transaction; a SQLException rolls the
    * transaction back (or discards it with the dead connection), reopens,
    * and replays the SAME group (service_hub.py:49-64 — the failed
    * executemany is retried on a fresh connection, never dropped). The
    * commit-per-batch makes the replay exactly-once-per-batch: a batch is
    * either fully committed or fully absent when the retry runs. */
  private[epic] def writePartition(url: String, user: String, pw: String,
      sql: String, rows: Iterator[Row], batchSize: Int, maxRetries: Int,
      retryDelayMs: Long): Unit = {
    if (!rows.hasNext) return
    var conn = connect(url, user, pw)
    try {
      rows.grouped(batchSize).foreach { group =>
        var attempt = 0
        var done = false
        while (!done) {
          var ps: PreparedStatement = null
          try {
            ps = conn.prepareStatement(sql)
            group.foreach { r =>
              var i = 0
              while (i < r.length) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
            }
            ps.executeBatch()
            if (!conn.getAutoCommit) conn.commit()
            done = true
          } catch {
            case e: SQLException =>
              attempt += 1
              if (attempt > maxRetries) throw e
              // roll back any partial batch before replaying: a closed
              // connection discards the open transaction anyway, but an
              // explicit rollback covers drivers that auto-commit on close
              try { if (!conn.getAutoCommit) conn.rollback() }
              catch { case _: Exception => }
              try conn.close() catch { case _: Exception => }
              Thread.sleep(retryDelayMs * attempt)
              conn = connect(url, user, pw)
          } finally {
            if (ps != null) { try ps.close() catch { case _: Exception => } }
          }
        }
      }
    } finally {
      try conn.close() catch { case _: Exception => }
    }
  }
}
