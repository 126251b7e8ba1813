package graft.epic

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Synthetic EPIC image cubes per FIXTURES.md §A.1: 64×64 grid,
  * SIN-projection headers centered at (ra,dec) = (180°, 34°) with the
  * all-sky direction-cosine scale CDELT = (180/π)/(xdim/2) deg/px.
  *
  * Defaults are the small test shape (nchan=4, npol=2, ~256 KB float32);
  * `nChan = 22` reproduces the reference imager's ~1.4 MB cube
  * (run.py commented defaults: 22 channels, 96 ms accumulation) for
  * throughput benchmarking.
  *
  * Cube values follow the exact-in-float pattern
  * value(k, y, x) = k·100000 + y·xdim + x   (k = plane index over
  * complex×pol×chan), so gather results are fully predictable.
  */
object ImageFixtures {

  val XDim = 64; val YDim = 64; val NChan = 4; val NPol = 2
  val Ra0 = 180.0; val Dec0 = 34.0
  /** 1-based reference pixel at image center. */
  val CrPix = 33.0
  /** deg/px such that one pixel = 2/xdim in direction cosine. */
  val CDelt: Double = (180.0 / math.Pi) / (XDim / 2.0)

  def imgHeader(datetime: String, filename: String,
      nChan: Int = NChan, nPol: Int = NPol): Map[String, String] = Map(
    "CRVAL1" -> Ra0.toString, "CRVAL2" -> Dec0.toString,
    "CRPIX1" -> CrPix.toString, "CRPIX2" -> CrPix.toString,
    "CDELT1" -> CDelt.toString, "CDELT2" -> CDelt.toString,
    "NAXIS1" -> XDim.toString, "NAXIS2" -> YDim.toString,
    "NAXIS3" -> nChan.toString, "NAXIS4" -> nPol.toString,
    "CRVAL3" -> "60000000", "CDELT3" -> "25000", "CRPIX3" -> "1",
    "DATETIME" -> datetime, "FILENAME" -> filename)

  val primaryHeader: Map[String, String] = Map(
    "GRIDDIMX" -> "64", "GRIDDIMY" -> "64",
    "DGRIDX" -> "1.0", "DGRIDY" -> "1.0", "INTTIM" -> "0.08")

  def cube(nChan: Int = NChan, nPol: Int = NPol): Array[Float] = {
    val planes = 2 * nPol * nChan
    val out = new Array[Float](planes * YDim * XDim)
    var k = 0
    while (k < planes) {
      var y = 0
      while (y < YDim) {
        var x = 0
        while (x < XDim) {
          out((k * YDim + y) * XDim + x) = (k * 100000 + y * XDim + x).toFloat
          x += 1
        }
        y += 1
      }
      k += 1
    }
    out
  }

  /** Cube synthesis happens EXECUTOR-side: tasks carry only (datetime,
    * index) seeds, never the multi-MB cube bytes — at nChan=22 a
    * driver-side build would ship ~1.4 MB per row inside the task binary
    * (Spark's "task of very large size" warning, and at cluster scale a
    * driver-bandwidth bottleneck). */
  def imagesDf(spark: SparkSession, datetimes: Seq[String],
      nChan: Int = NChan, nPol: Int = NPol,
      numPartitions: Int = 1): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(datetimes.zipWithIndex, numPartitions)
      .map { case (dt, i) =>
        Row(primaryHeader, imgHeader(dt, s"EPIC_fixture_$i.fits", nChan, nPol),
          "float32", Seq(2, nPol, nChan, YDim, XDim),
          cube(nChan, nPol).toSeq)
      }
    spark.createDataFrame(rdd, EpicPipeline.imageSchema)
  }

  /** Same images with the cube as a raw little-endian float32 blob
    * (EpicPipeline.imageBinarySchema); blob built executor-side like
    * [[imagesDf]]. */
  def imagesBinaryDf(spark: SparkSession, datetimes: Seq[String],
      nChan: Int = NChan, nPol: Int = NPol,
      numPartitions: Int = 1): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(datetimes.zipWithIndex, numPartitions)
      .map { case (dt, i) =>
        val floats = cube(nChan, nPol)
        val bb = java.nio.ByteBuffer.allocate(floats.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        floats.foreach(bb.putFloat)
        Row(primaryHeader, imgHeader(dt, s"EPIC_fixture_$i.fits", nChan, nPol),
          "float32", Seq(2, nPol, nChan, YDim, XDim), bb.array())
      }
    spark.createDataFrame(rdd, EpicPipeline.imageBinarySchema)
  }

  /** Watchlist: center hit (3x3), offset hit (5x5), a patch straddling the
    * FOV ring (dropped by group-ALL), and an opposite-hemisphere source
    * (NaN from the projection, dropped pre-explode).
    *
    * Geometry (xdim=64, elev limit 30° ⇒ max_rad = 32·cos30° ≈ 27.71):
    *  - center  (180,34)            → 0-based (32,32)
    *  - offset  (183,34)            → (33,32); whole 5×5 patch in FOV
    *  - ring    (180,-23.55)        → (32,5): center dist 27 < 27.71 passes
    *    the pre-filter, but patch pixels at py=3 have dist 29 → A1 drops all
    *  - behind  (0,34)              → cos(c) < 0 ⇒ NaN ⇒ pre-filter drop
    */
  def watchRows: Seq[(Long, String, Double, Double, String)] = Seq(
    (1L, "center", 180.0, 34.0, "3x3"),
    (2L, "offset", 183.0, 34.0, "5"),
    (3L, "ring", 180.0, Dec0 - 57.55, "5"),
    (4L, "behind", 0.0, 34.0, "3x3"))

  def watchlistDf(spark: SparkSession): DataFrame = {
    val rows = watchRows.map { case (id, n, ra, dec, p) =>
      Row(id, n, ra, dec, p)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), EpicPipeline.watchSchema)
  }
}
