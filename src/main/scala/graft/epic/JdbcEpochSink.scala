package graft.epic

import java.sql.SQLException

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once JDBC sink for streaming micro-batches.
  *
  * `foreachBatch` replays a batch after a failure, and the plain
  * [[JdbcSink]] append is at-least-once across such replays (each BATCH of
  * rows is transactional, but a crash between the data insert and
  * checkpoint commit re-runs the whole epoch). This wrapper makes the
  * replay idempotent with the standard epoch-scrub pattern:
  *
  *  1. every row lands with `graft_sink_id` + `graft_epoch` columns
  *     appended (letter-first names — `_x` needs quoting in some DBs);
  *  2. a replayed epoch first DELETEs the epoch's rows (scrubbing any
  *     partial write from the failed attempt), then re-inserts;
  *  3. a driver-side marker table records completed epochs, so a fully
  *     committed epoch is skipped without touching the data table.
  *
  * Net effect: whatever interleaving of crashes and replays occurs, the
  * table converges to exactly one copy of each epoch's rows. The epoch
  * columns are additive — the reference's `epic_pixels` schema gains two
  * bookkeeping columns, the price of exactly-once on an engine that
  * cannot span one transaction across executors (the reference never
  * replays, so it never faces the problem; SURVEY §5.3 calls out replay
  * semantics as engine-new).
  *
  * Scale shape: the scrub DELETE and marker ops are driver-side, O(1) per
  * epoch; data inserts run executor-side through [[JdbcSink]] (batched,
  * transactional, one connection per partition). An index on
  * (graft_sink_id, graft_epoch) keeps the scrub from scanning the table.
  */
class JdbcEpochSink(url: String, user: String = "", password: String = "",
    batchSize: Int = 500, maxRetries: Int = 3, retryDelayMs: Long = 100,
    markerTable: String = "graft_sink_epochs")
    extends Serializable {

  private val sink =
    new JdbcSink(url, user, password, batchSize, maxRetries, retryDelayMs)

  private def withConn[T](f: java.sql.Connection => T): T = {
    val conn = JdbcSink.connect(url, user, password)
    try {
      val r = f(conn)
      if (!conn.getAutoCommit) conn.commit()
      r
    } catch {
      case e: Throwable =>
        try { if (!conn.getAutoCommit) conn.rollback() }
        catch { case _: Exception => }
        throw e
    } finally {
      try conn.close() catch { case _: Exception => }
    }
  }

  private def ensureMarkerTable(): Unit = withConn { conn =>
    val st = conn.createStatement()
    try st.executeUpdate(
      s"""CREATE TABLE $markerTable (
         |  sink_id VARCHAR(256) NOT NULL,
         |  epoch BIGINT NOT NULL,
         |  PRIMARY KEY (sink_id, epoch))""".stripMargin)
    catch {
      case e: SQLException
        if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" =>
    } finally st.close()
  }

  /** True if `epoch` already fully committed for `sinkId`. */
  def committed(sinkId: String, epoch: Long): Boolean = {
    ensureMarkerTable()
    withConn { conn =>
      val ps = conn.prepareStatement(
        s"SELECT COUNT(*) FROM $markerTable WHERE sink_id = ? AND epoch = ?")
      try {
        ps.setString(1, sinkId); ps.setLong(2, epoch)
        val rs = ps.executeQuery(); rs.next(); rs.getLong(1) > 0
      } finally ps.close()
    }
  }

  /** Idempotent epoch append: skip if committed, scrub partials, insert,
    * mark. Safe to call any number of times with the same epoch. */
  def appendOnce(df: DataFrame, table: String, sinkId: String,
      epoch: Long): Unit = {
    if (committed(sinkId, epoch)) return
    // scrub a partial write left by a previous attempt of this epoch
    // (a data table that does not exist yet has nothing to scrub — the
    // insert below will surface the real error if it is genuinely absent)
    try withConn { conn =>
      val ps = conn.prepareStatement(
        s"DELETE FROM $table WHERE graft_sink_id = ? AND graft_epoch = ?")
      try { ps.setString(1, sinkId); ps.setLong(2, epoch); ps.executeUpdate() }
      finally ps.close()
    } catch {
      case e: SQLException
        if e.getSQLState == "42X05" || e.getSQLState == "42P01" => // no table
    }
    sink.append(
      df.withColumn("graft_sink_id", lit(sinkId))
        .withColumn("graft_epoch", lit(epoch)),
      table)
    withConn { conn =>
      val ps = conn.prepareStatement(
        s"INSERT INTO $markerTable (sink_id, epoch) VALUES (?, ?)")
      try { ps.setString(1, sinkId); ps.setLong(2, epoch); ps.executeUpdate() }
      finally ps.close()
    }
  }
}
