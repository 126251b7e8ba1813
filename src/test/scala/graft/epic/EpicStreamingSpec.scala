package graft.epic

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class ImageRecord(primary_hdr: Map[String, String],
    img_hdr: Map[String, String], dtype: String, shape: Seq[Int],
    image: Seq[Float])

/** Deterministic replay tests of the streaming semantics (SURVEY §5.3):
  * watch freshness, expiry, empty-FOV early return, duplicate guard. */
class EpicStreamingSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def record(dt: String): ImageRecord = ImageRecord(
    ImageFixtures.primaryHeader, ImageFixtures.imgHeader(dt, s"EPIC_$dt.fits"),
    "float32", Seq(2, ImageFixtures.NPol, ImageFixtures.NChan,
      ImageFixtures.YDim, ImageFixtures.XDim), ImageFixtures.cube().toSeq)

  private def imagesDf(dts: String*): DataFrame = {
    import spark.implicits._
    dts.map(record).toDF()
  }

  private def pixelCount(outDir: String): Long =
    try spark.read.parquet(s"$outDir/epic_pixels").count()
    catch { case _: Exception => 0L }

  private def metaCount(outDir: String): Long =
    try spark.read.parquet(s"$outDir/epic_img_metadata").count()
    catch { case _: Exception => 0L }

  test("(a) watch added mid-stream joins from the next batch on") {
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    val out = tmp("out")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    EpicStreaming.processBatch(imagesDf("2022-08-31T23:29:10.000000"),
      store, out)
    assert(pixelCount(out) == 9L)
    store.addWatch("offset", "183.0", "34.0", patchType = "5")
    EpicStreaming.processBatch(imagesDf("2022-08-31T23:29:11.000000"),
      store, out)
    assert(pixelCount(out) == 9L + 9L + 25L)
    assert(metaCount(out) == 2L)
  }

  test("(b) expired watch stops producing rows and flips to 'watched'") {
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    val out = tmp("out")
    val t0 = new Timestamp(1661990950000L)
    store.addWatch("center", "180.0", "34.0", watchMode = "timed",
      duration = "1s", now = t0)
    // first batch inside the window
    EpicStreaming.processBatch(imagesDf("2022-08-31T23:29:10.000000"),
      store, out, now = () => new Timestamp(t0.getTime + 500L))
    assert(pixelCount(out) == 9L)
    // second batch after expiry: M2 flips status, join sees nothing
    EpicStreaming.processBatch(imagesDf("2022-08-31T23:29:11.000000"),
      store, out, now = () => new Timestamp(t0.getTime + 2000L))
    assert(pixelCount(out) == 9L)
    val status = store.listAll().select("watch_status").collect()
      .map(_.getString(0)).toSeq
    assert(status == Seq("watched"))
  }

  test("(c) image with no in-FOV source: no pixel rows AND no metadata row") {
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    val out = tmp("out")
    store.addWatch("behind", "0.0", "34.0")
    EpicStreaming.processBatch(imagesDf("2022-08-31T23:29:10.000000"),
      store, out)
    assert(pixelCount(out) == 0L && metaCount(out) == 0L)
  }

  test("(d) duplicate watch add is rejected while the first is watching") {
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    store.addWatch("center", "180.0", "34.0")
    intercept[IllegalStateException] {
      store.addWatch("center", "180.0", "34.0")
    }
    // after expiry the name is free again (status 'watched', not 'watching')
    store.expireDue(new Timestamp(System.currentTimeMillis() +
      200L * 365 * 86400000L))
    store.addWatch("center", "180.0", "34.0")
  }

  test("restart from checkpoint: committed batches are not reprocessed") {
    import spark.implicits._
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    val out = tmp("out")
    val ckpt = tmp("ckpt")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val mem = MemoryStream[ImageRecord](spark, 1)
    mem.addData(record("2022-08-31T23:29:10.000000"))
    val q1 = EpicStreaming.start(mem.toDF(), store, out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    assert(pixelCount(out) == 9L && metaCount(out) == 1L)
    // second run, SAME checkpoint: the first batch's offsets are
    // committed, so only the new frame is processed — no duplicate
    // pixel/metadata rows from batch replay
    mem.addData(record("2022-08-31T23:29:11.000000"))
    val q2 = EpicStreaming.start(mem.toDF(), store, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(pixelCount(out) == 18L, "batch replayed or lost after restart")
    assert(metaCount(out) == 2L)
    assert(spark.read.parquet(s"$out/epic_img_metadata")
      .select("id").distinct().count() == 2L)
  }

  test("end-to-end MemoryStream run through EpicStreaming.start") {
    import spark.implicits._
    val store = new WatchStore(spark, tmp("watch") + "/wl")
    val out = tmp("out")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val mem = MemoryStream[ImageRecord](spark, 1)
    mem.addData(record("2022-08-31T23:29:10.000000"),
      record("2022-08-31T23:29:11.000000"))
    val q = EpicStreaming.start(mem.toDF(), store, out, tmp("ckpt"))
    q.processAllAvailable()
    q.stop()
    assert(pixelCount(out) == 18L)
    assert(metaCount(out) == 2L)
    // the two epochs have distinct deterministic ids
    assert(spark.read.parquet(s"$out/epic_img_metadata")
      .select("id").distinct().count() == 2L)
  }
}
