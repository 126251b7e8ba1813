package graft.epic

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpicPipelineSpec extends SparkSpec {

  private def run(watchNames: String*) = {
    val images = ImageFixtures.imagesDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val watch0 = ImageFixtures.watchlistDf(spark)
    val watch = if (watchNames.isEmpty) watch0
      else watch0.where(col("source_name").isin(watchNames: _*))
    EpicPipeline.pixelsAndMeta(images, watch)
  }

  test("in-FOV sources produce exactly patch² pixel rows, all-or-nothing") {
    val (pixels, meta) = run()
    val bySrc = pixels.groupBy("source_names").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // center: 3x3 = 9; offset: 5x5 = 25; ring straddles the FOV ring so A1
    // drops all 25; behind is NaN-projected and never explodes.
    assert(bySrc == Map("center" -> 9L, "offset" -> 25L))
    assert(meta.count() == 1L)
  }

  test("gather pulls the strided [complex,pol,chan] vector for the pixel") {
    val (pixels, _) = run("center")
    val r = pixels.where(col("pix_ofst_x") === 0 && col("pix_ofst_y") === 0)
      .select(col("pixel_coord.x"), col("pixel_coord.y"),
        col("pixel_values"), col("pixel_lm.l"), col("pixel_lm.m"))
      .collect().head
    assert(r.getInt(0) == 32 && r.getInt(1) == 32)
    val values = r.getSeq[Double](2)
    assert(values.length == 2 * ImageFixtures.NPol * ImageFixtures.NChan)
    val expected = (0 until 16).map(k => (k * 100000 + 32 * 64 + 32).toDouble)
    assert(values == expected)
    // lm at dead center: l = 32*2/64 - 1 = 0
    assert(math.abs(r.getDouble(3)) < 1e-12 && math.abs(r.getDouble(4)) < 1e-12)
  }

  test("patch offsets are carried and patches are centered") {
    val (pixels, _) = run("offset")
    val rows = pixels.select("pixel_coord.x", "pixel_coord.y",
      "pix_ofst_x", "pix_ofst_y").collect()
    assert(rows.length == 25)
    val offs = rows.map(r => (r.getInt(2), r.getInt(3))).toSet
    assert(offs == (for { dx <- -2 to 2; dy <- -2 to 2 } yield (dx, dy)).toSet)
    // every pixel = center + offset; offset source lands at (33, 32)
    assert(rows.forall(r => r.getInt(0) == 33 + r.getInt(2) &&
      r.getInt(1) == 32 + r.getInt(3)))
  }

  test("patch straddling the FOV ring is dropped as a whole (A1)") {
    val (pixels, meta) = run("ring")
    assert(pixels.count() == 0L)
    // store_pg early-return: no pixels ⇒ no metadata row either
    assert(meta.count() == 0L)
  }

  test("opposite-hemisphere source projects to NaN and never explodes") {
    val (pixels, meta) = run("behind")
    assert(pixels.count() == 0L && meta.count() == 0L)
  }

  test("metadata row carries header-derived fields and sorted source set") {
    val (_, meta) = run()
    val m = meta.collect().head
    assert(m.getAs[java.sql.Timestamp]("img_time").toString
      .startsWith("2022-08-31 23:29:10"))
    assert(m.getAs[Int]("n_chan") == 4 && m.getAs[Int]("n_pol") == 2)
    // chan0 = CRVAL3 - CDELT3*CRPIX3 = 60e6 - 25e3
    assert(m.getAs[Double]("chan0") == 59975000.0)
    assert(m.getAs[Double]("chan_bw") == 25000.0)
    assert(m.getAs[Row]("img_size") == Row(64, 64))
    assert(m.getAs[Double]("int_time") == 0.08)
    assert(m.getAs[scala.collection.Seq[String]]("source_names").toSeq ==
      Seq("center", "offset"))
  }

  test("pixels and metadata share the deterministic epoch id") {
    val (pixels, meta) = run()
    val pid = pixels.select("id").distinct().collect().map(_.getString(0)).toSet
    val mid = meta.select("id").distinct().collect().map(_.getString(0)).toSet
    assert(pid == mid && pid.size == 1)
  }

  test("binary-blob image layout produces identical pixel frames") {
    val dts = Seq("2022-08-31T23:29:10.000000")
    val watch = ImageFixtures.watchlistDf(spark)
    val (pxArr, _) = EpicPipeline.pixelsAndMeta(
      ImageFixtures.imagesDf(spark, dts), watch)
    val (pxBin, _) = EpicPipeline.pixelsAndMeta(
      ImageFixtures.imagesBinaryDf(spark, dts), watch)
    val key = (r: Row) => (r.getAs[Row]("pixel_coord").toString,
      r.getAs[String]("source_names"))
    val a = pxArr.collect().map(r =>
      key(r) -> r.getAs[scala.collection.Seq[Double]]("pixel_values").toSeq)
      .toMap
    val b = pxBin.collect().map(r =>
      key(r) -> r.getAs[scala.collection.Seq[Double]]("pixel_values").toSeq)
      .toMap
    assert(a.nonEmpty && a == b)
  }

  test("PG formatting produces EWKT/point strings at the sink boundary") {
    val (pixels, _) = run("center")
    val r = EpicPipeline.toPgStrings(pixels)
      .where(col("pix_ofst_x") === 0 && col("pix_ofst_y") === 0)
      .select("pixel_coord", "pixel_skypos", "pixel_lm").collect().head
    assert(r.getString(0) == "(32,32)")
    assert(r.getString(1).startsWith("SRID=4326;POINT(180"))
    assert(r.getString(2).startsWith("(0"))
  }
}
