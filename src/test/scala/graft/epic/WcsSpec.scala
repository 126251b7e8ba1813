package graft.epic

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class WcsSpec extends SparkSpec {
  import ImageFixtures._

  test("nearestPix matches the reference rounding, incl. frac == 0.5") {
    import spark.implicits._
    // reference: floor(p + min(frac(p), 0.5)) — watch_dog.py:281-286.
    // 2.5 → 3 but -0.5 → 0 (builtin half-up round would give -1 … 3).
    val cases = Seq(2.5 -> 3.0, 2.4 -> 2.0, 2.6 -> 3.0, -0.5 -> 0.0,
      -0.4 -> 0.0, -0.6 -> -1.0, 0.0 -> 0.0, 33.4999 -> 33.0, 33.5 -> 34.0)
    val got = cases.map(_._1).toDF("p")
      .select(Wcs.nearestPix(col("p"))).as[Double].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("nearestPix negative-p domain note: diverges from np.modf for " +
      "p < 0, masked by the x >= 0 FOV filter") {
    import spark.implicits._
    // The reference's np.modf yields a NEGATIVE frac for p < 0
    // (modf(-0.3) = -0.3), so its rounding gives floor(-0.3 + (-0.3))
    // = -1, while this engine's non-negative frac (p - floor(p) = 0.7,
    // clamped to 0.5) gives floor(0.2) = 0. Both land at x < 0 and the
    // FOV predicate (x >= 0 ∧ y >= 0) drops them, so the divergence is
    // observationally masked — this test DOCUMENTS it (Wcs.nearestPix
    // scaladoc) so nobody "fixes" it either direction without
    // re-checking that filter.
    val engine = Seq(-0.3).toDF("p")
      .select(Wcs.nearestPix(col("p"))).as[Double].head()
    assert(engine === 0.0)          // engine's answer
    val modfStyle = math.floor(-0.3 + math.min(-0.3, 0.5))
    assert(modfStyle === -1.0)      // the reference's answer
    assert(engine != modfStyle && engine < 1.0 && modfStyle < 1.0,
      "both answers sit left of the FOV's x >= 0 cut — masked")
  }

  test("world2pix places the projection center on the reference pixel") {
    import spark.implicits._
    val r = Seq((Ra0, Dec0)).toDF("ra", "dec")
      .select(Wcs.world2pix(col("ra"), col("dec"), lit(Ra0), lit(Dec0),
        lit(CrPix), lit(CrPix), lit(CDelt), lit(CDelt)).as("p"))
      .select("p.x", "p.y").as[(Double, Double)].collect().head
    assert(math.abs(r._1 - CrPix) < 1e-9 && math.abs(r._2 - CrPix) < 1e-9)
  }

  test("world2pix → pix2world round-trips inside the projection") {
    import spark.implicits._
    val pts = for { dra <- -60 to 60 by 15; ddec <- -40 to 40 by 10 }
      yield (Ra0 + dra, Dec0 + ddec)
    val ok = pts.filter { case (_, d) => d > -56.0 && d < 90.0 }
    val rt = ok.toDF("ra", "dec")
      .withColumn("p", Wcs.world2pix(col("ra"), col("dec"), lit(Ra0),
        lit(Dec0), lit(CrPix), lit(CrPix), lit(CDelt), lit(CDelt)))
      .where(!isnan(col("p.x")))
      .withColumn("w", Wcs.pix2world(col("p.x"), col("p.y"), lit(Ra0),
        lit(Dec0), lit(CrPix), lit(CrPix), lit(CDelt), lit(CDelt)))
      .select(col("ra"), col("dec"), col("w.ra").as("ra2"),
        col("w.dec").as("dec2"))
      .as[(Double, Double, Double, Double)].collect()
    assert(rt.nonEmpty)
    rt.foreach { case (ra, dec, ra2, dec2) =>
      assert(math.abs(dec - dec2) < 1e-8, s"dec $dec vs $dec2")
      val dra = math.abs((ra - ra2 + 540) % 360 - 180)
      assert(dra * math.cos(math.toRadians(dec)) < 1e-8, s"ra $ra vs $ra2")
    }
  }

  test("world2pix is NaN on the opposite hemisphere") {
    import spark.implicits._
    val r = Seq((Ra0 + 180.0, -Dec0)).toDF("ra", "dec")
      .select(Wcs.world2pix(col("ra"), col("dec"), lit(Ra0), lit(Dec0),
        lit(CrPix), lit(CrPix), lit(CDelt), lit(CDelt)).as("p"))
      .select("p.x").as[Double].collect().head
    assert(r.isNaN)
  }

  test("pix2world is NaN outside the unit direction-cosine disk") {
    import spark.implicits._
    // pixel far outside the 64-px all-sky disk ⇒ l² + m² > 1
    val r = Seq((200.0, 33.0)).toDF("x", "y")
      .select(Wcs.pix2world(col("x"), col("y"), lit(Ra0), lit(Dec0),
        lit(CrPix), lit(CrPix), lit(CDelt), lit(CDelt)).as("w"))
      .select("w.ra").as[Double].collect().head
    assert(r.isNaN)
  }

  test("property: nearestPix is integral and within 0.5 of its input") {
    import spark.implicits._
    val gen = Gen.chooseNum(-1e6, 1e6)
    val samples = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val got = samples.toDF("p")
      .select(col("p"), Wcs.nearestPix(col("p")).as("v"))
      .as[(Double, Double)].collect()
    assert(got.length == samples.length)
    got.foreach { case (p, v) =>
      assert(v == math.floor(v))
      assert(math.abs(v - p) <= 0.5 + 1e-9, s"p=$p v=$v")
    }
  }
}
