package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.epic.{EpicStreaming, ImageFixtures}

class GraftEngineSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("facade: addWatch → watchlist → JSON round-trip") {
    val engine = new GraftEngine(spark, tmp("store") + "/wl")
    val id = engine.addWatch("Cyg A", "19h59m28.3566s", "+40d44m02s")
    assert(id == 1L)
    val wl = engine.watchlist().collect()
    assert(wl.length == 1)
    val row = engine.watchlist().where(col("source_name") === "Cyg A")
      .select("ra", "dec").collect().head
    assert(math.abs(row.getDouble(0) - 299.868) < 0.01)
    assert(math.abs(row.getDouble(1) - 40.7339) < 0.01)
    assert(engine.watchlistJson().exists(_.contains("Cyg A")))
  }

  test("light curves: element-wise sums across epochs per (source, pixel)") {
    val engine = new GraftEngine(spark, tmp("store") + "/wl")
    engine.store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val out = tmp("out")
    // two epochs through the batch runner
    EpicStreaming.processBatch(
      ImageFixtures.imagesDf(spark, Seq("2022-08-31T23:29:10.000000")),
      engine.store, out)
    EpicStreaming.processBatch(
      ImageFixtures.imagesDf(spark, Seq("2022-08-31T23:29:11.000000")),
      engine.store, out)
    val lc = engine.lightCurves(s"$out/epic_pixels", s"$out/epic_img_metadata")
    val rows = lc.collect()
    assert(rows.length == 9) // 3x3 patch → 9 (source, pixel) series
    val center = lc.where(col("pixel_coord.x") === 32 &&
      col("pixel_coord.y") === 32).collect().head
    assert(center.getAs[Long]("n_epochs") == 2L)
    // both epochs have identical fixture cubes: sum = 2 × single-epoch value
    val summed = center.getAs[scala.collection.Seq[Double]]("summed_values")
    val expected = (0 until 16).map(k => 2.0 * (k * 100000 + 32 * 64 + 32))
    assert(summed.toSeq == expected)
  }

  test("transient hook runs between pipeline and store") {
    val engine = new GraftEngine(spark, tmp("store") + "/wl")
    engine.store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val out = tmp("out")
    EpicStreaming.processBatch(
      ImageFixtures.imagesDf(spark, Seq("2022-08-31T23:29:10.000000")),
      engine.store, out,
      transientHook = df => df.withColumn("transient_score", lit(0.5d)))
    val stored = spark.read.parquet(s"$out/epic_pixels")
    assert(stored.columns.contains("transient_score"))
    assert(stored.count() == 9)
  }
}
