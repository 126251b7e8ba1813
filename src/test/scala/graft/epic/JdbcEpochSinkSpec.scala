package graft.epic

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** Exactly-once epoch sink against embedded Derby: replays converge to one
  * copy of each epoch, partial writes are scrubbed, committed epochs are
  * skipped without touching data. */
class JdbcEpochSinkSpec extends SparkSpec {

  private def freshDb(): String =
    s"jdbc:derby:${Files.createTempDirectory("epochdb")}/db;create=true"

  private def exec(url: String, sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.executeUpdate(sql)
      finally st.close() } finally c.close()
  }

  private def queryLong(url: String, sql: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try { val rs = st.executeQuery(sql); rs.next(); rs.getLong(1) }
      finally st.close()
    } finally c.close()
  }

  private val ddl =
    """CREATE TABLE t (id BIGINT, nm VARCHAR(64),
      |  graft_sink_id VARCHAR(256), graft_epoch BIGINT)""".stripMargin

  private def df3 = {
    import spark.implicits._
    (1 to 5).map(i => (i.toLong, s"name_$i")).toDF("id", "nm").coalesce(1)
  }

  test("replaying the same epoch does not duplicate rows") {
    val url = freshDb()
    exec(url, ddl)
    val sink = new JdbcEpochSink(url, batchSize = 2, retryDelayMs = 1)
    sink.appendOnce(df3, "t", "s1", 0L)
    assert(queryLong(url, "SELECT COUNT(*) FROM t") == 5)
    // the foreachBatch replay path: same frame, same epoch, twice more
    sink.appendOnce(df3, "t", "s1", 0L)
    sink.appendOnce(df3, "t", "s1", 0L)
    assert(queryLong(url, "SELECT COUNT(*) FROM t") == 5)
    assert(sink.committed("s1", 0L))
    // the next epoch appends normally
    sink.appendOnce(df3, "t", "s1", 1L)
    assert(queryLong(url, "SELECT COUNT(*) FROM t") == 10)
  }

  test("a partial write from a crashed attempt is scrubbed on replay") {
    val url = freshDb()
    exec(url, ddl)
    // simulate: epoch 7 crashed after inserting 2 of its rows and before
    // the marker landed
    exec(url, "INSERT INTO t VALUES (99, 'ghost_a', 's1', 7)")
    exec(url, "INSERT INTO t VALUES (98, 'ghost_b', 's1', 7)")
    val sink = new JdbcEpochSink(url, retryDelayMs = 1)
    assert(!sink.committed("s1", 7L))
    sink.appendOnce(df3, "t", "s1", 7L)
    // ghosts gone, exactly the 5 real rows for epoch 7
    assert(queryLong(url, "SELECT COUNT(*) FROM t WHERE graft_epoch = 7") == 5)
    assert(queryLong(url,
      "SELECT COUNT(*) FROM t WHERE nm LIKE 'ghost%'") == 0)
  }

  test("epochs are independent per sink id") {
    val url = freshDb()
    exec(url, ddl)
    val sink = new JdbcEpochSink(url, retryDelayMs = 1)
    sink.appendOnce(df3, "t", "pixels", 0L)
    assert(sink.committed("pixels", 0L))
    assert(!sink.committed("meta", 0L))
    sink.appendOnce(df3, "t", "meta", 0L)
    assert(queryLong(url, "SELECT COUNT(*) FROM t") == 10)
  }

  test("EPIC batch lands exactly once through the epoch sink") {
    val url = freshDb()
    exec(url,
      """CREATE TABLE epic_pixels (id VARCHAR(64), pixel_coord VARCHAR(64),
        |  pixel_values VARCHAR(4096), pixel_skypos VARCHAR(256),
        |  source_names VARCHAR(256), pixel_lm VARCHAR(256),
        |  pix_ofst_x INT, pix_ofst_y INT,
        |  graft_sink_id VARCHAR(256), graft_epoch BIGINT)""".stripMargin)
    exec(url,
      """CREATE TABLE epic_img_metadata (id VARCHAR(64), img_time TIMESTAMP,
        |  n_chan INT, n_pol INT, chan0 DOUBLE, chan_bw DOUBLE,
        |  epic_version VARCHAR(64), img_size VARCHAR(64), int_time DOUBLE,
        |  source_names VARCHAR(1024),
        |  graft_sink_id VARCHAR(256), graft_epoch BIGINT)""".stripMargin)
    val store = new WatchStore(spark,
      Files.createTempDirectory("wl").toString + "/wl")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val epochSink = EpicStreaming.jdbcExactlyOnceSink(
      new JdbcEpochSink(url, retryDelayMs = 1))
    val (px, meta) = EpicPipeline.pixelsAndMeta(images, store.watchlist())
    // the values JdbcSink would write: PG-literal formatted frames
    epochSink(px, meta, 0L)
    epochSink(px, meta, 0L) // replay
    assert(queryLong(url, "SELECT COUNT(*) FROM epic_pixels") == 9)
    assert(queryLong(url, "SELECT COUNT(*) FROM epic_img_metadata") == 1)
  }
}
