package graft.epic

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EphemerisSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private def sep(a: (Double, Double), b: (Double, Double)): Double = {
    val (ra1, d1) = (math.toRadians(a._1), math.toRadians(a._2))
    val (ra2, d2) = (math.toRadians(b._1), math.toRadians(b._2))
    math.toDegrees(math.acos(math.min(1.0,
      math.sin(d1) * math.sin(d2) +
        math.cos(d1) * math.cos(d2) * math.cos(ra1 - ra2))))
  }

  test("sun crosses the equator at the 2023 March equinox") {
    val Some((ra, dec)) = Ephemeris.position("sun", ts("2023-03-20T21:24:00Z"))
    assert(math.abs(dec) < 0.1, s"dec=$dec")
    assert(ra < 1.0 || ra > 359.0, s"ra=$ra")
  }

  test("sun at the 2022 June solstice: ra≈90, dec≈+obliquity") {
    val Some((ra, dec)) = Ephemeris.position("sun", ts("2022-06-21T09:14:00Z"))
    assert(math.abs(ra - 90.0) < 1.0, s"ra=$ra")
    assert(math.abs(dec - 23.43) < 0.1, s"dec=$dec")
  }

  test("full moon (2022-09-10) is opposite the sun") {
    val t = ts("2022-09-10T09:59:00Z")
    val Some(moon) = Ephemeris.position("moon", t)
    val Some(sun) = Ephemeris.position("sun", t)
    assert(sep(moon, sun) > 160.0, s"sep=${sep(moon, sun)}")
  }

  test("moon moves ~13 deg/day; jupiter barely moves") {
    val t1 = ts("2022-08-31T00:00:00Z"); val t2 = ts("2022-09-01T00:00:00Z")
    val m = sep(Ephemeris.position("moon", t1).get,
      Ephemeris.position("moon", t2).get)
    assert(m > 10 && m < 16, s"moon daily motion $m")
    val j = sep(Ephemeris.position("jupiter", t1).get,
      Ephemeris.position("jupiter", t2).get)
    assert(j < 0.3, s"jupiter daily motion $j")
  }

  test("planets stay near the ecliptic plane") {
    val t = ts("2022-08-31T23:29:10Z")
    val eps = math.toRadians(23.43928)
    for (b <- Seq("mercury", "venus", "mars", "jupiter", "saturn")) {
      val Some((ra, dec)) = Ephemeris.position(b, t)
      // ecliptic latitude from equatorial
      val (raR, decR) = (math.toRadians(ra), math.toRadians(dec))
      val beta = math.asin(math.sin(decR) * math.cos(eps) -
        math.cos(decR) * math.sin(eps) * math.sin(raR))
      assert(math.abs(math.toDegrees(beta)) < 8.0, s"$b beta")
    }
  }

  test("non-bodies are untouched") {
    assert(Ephemeris.position("cyg a", ts("2022-08-31T23:29:10Z")).isEmpty)
    assert(Ephemeris.position("earth", ts("2022-08-31T23:29:10Z")).isEmpty)
  }

  test("pipeline rewrites a watched body to its per-image position") {
    // build an image whose projection center IS jupiter's position at the
    // fixture time: the body patch must land on the reference pixel.
    val t = "2022-08-31T23:29:10.000000"
    val Some((jra, jdec)) =
      Ephemeris.position("jupiter", ts("2022-08-31T23:29:10Z"))
    val hdr = ImageFixtures.imgHeader(t, "EPIC_jup.fits") +
      ("CRVAL1" -> jra.toString) + ("CRVAL2" -> jdec.toString)
    val images = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        ImageFixtures.primaryHeader, hdr, "float32",
        Seq(2, ImageFixtures.NPol, ImageFixtures.NChan,
          ImageFixtures.YDim, ImageFixtures.XDim),
        ImageFixtures.cube().toSeq)), 1), EpicPipeline.imageSchema)
    val watch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "jupiter", 0.0, 0.0, "3x3")), 1),
      EpicPipeline.watchSchema) // deliberately wrong static coords
    val (pixels, _) = EpicPipeline.pixelsAndMeta(images, watch)
    val rows = pixels.select("pixel_coord.x", "pixel_coord.y").collect()
    assert(rows.length == 9) // 3x3 patch at the projection center
    val center = pixels.where(col("pix_ofst_x") === 0 &&
      col("pix_ofst_y") === 0).select("pixel_coord.x", "pixel_coord.y")
      .collect().head
    assert(center.getInt(0) == 32 && center.getInt(1) == 32)
  }
}
