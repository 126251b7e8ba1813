package graft.epic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The EPIC hot path (SURVEY.md §3.1), re-expressed as one declarative Spark
  * plan: image cubes × watchlist → per-source pixel patches → two output
  * frames (`epic_pixels`, `epic_img_metadata`).
  *
  * Reference dataflow being re-expressed (citations into
  * /root/reference/src/epic_stream_processor/epic_services/):
  *   watch_dog.py:359-498 (gen_pixdata_dfs) — world2pix → nearest_pix → FOV
  *   mask → patch explode → pix2world → NaN+FOV mask → all-or-nothing group
  *   filter → pixel gather → lm lookup → two DataFrames;
  *   uds_server.py:111-119 — each image is paired with the full current
  *   watchlist (the stream–static broadcast join J1).
  *
  * Scale design: the watchlist is the small side — always broadcast; the
  * image stream is the big side and is never shuffled until the (tiny)
  * group-ALL window over (image, source) patch rows. Header extraction,
  * projection, patch explode, filters and the gather are all narrow,
  * codegen-fused transforms, so a 1000-executor cluster processes images
  * embarrassingly parallel.
  *
  * Intentional divergences from the reference (documented, test-pinned):
  *  - epoch id is a content hash (DATETIME+FILENAME) instead of uuid4 —
  *    deterministic across retries/actions, required for exactly-once
  *    semantics on a cluster (uuid4 would differ between the pixels and
  *    metadata actions);
  *  - pixel_coord/skypos/lm are typed structs, not PG POINT/EWKT strings
  *    (formatting belongs in the JDBC sink boundary, SURVEY §1.2);
  *  - pixel_coord is 0-based (the reference stores the 1-based astropy x,y
  *    it later decrements when indexing, watch_dog.py:442-455).
  */
object EpicPipeline {

  /** Decoded image-record schema (FIXTURES.md A.1). */
  val imageSchema: StructType = StructType(Seq(
    StructField("primary_hdr", MapType(StringType, StringType)),
    StructField("img_hdr", MapType(StringType, StringType)),
    StructField("dtype", StringType),
    StructField("shape", ArrayType(IntegerType)),
    StructField("image", ArrayType(FloatType))))

  /** Binary-payload variant: the cube stays a raw little-endian float32
    * blob end-to-end and StridedGather decodes only the bytes it touches.
    * Preferred for file/lake-resident corpora — parquet reads one blob
    * instead of assembling millions of array elements per row
    * (SURVEY §7.3 "prune into the binary decode"). */
  val imageBinarySchema: StructType = StructType(Seq(
    StructField("primary_hdr", MapType(StringType, StringType)),
    StructField("img_hdr", MapType(StringType, StringType)),
    StructField("dtype", StringType),
    StructField("shape", ArrayType(IntegerType)),
    StructField("image", BinaryType)))

  /** Watchlist schema (FIXTURES.md A.2 subset that the hot path consumes —
    * P2 projection of watch_dog.py:109-117). */
  val watchSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("source_name", StringType),
    StructField("ra", DoubleType),
    StructField("dec", DoubleType),
    StructField("patch_type", StringType)))

  private def hdr(m: String, key: String): Column =
    element_at(col(m), key)

  private def hdrD(m: String, key: String): Column =
    hdr(m, key).cast(DoubleType)

  private def hdrI(m: String, key: String): Column =
    hdr(m, key).cast(IntegerType)

  /** Patch side length n from patch_type: "5" → 5, "3x3" → 3
    * (_utils/Utils.py:40-43). */
  def patchSize(patchType: Column): Column =
    when(patchType.contains("x"),
      split(patchType, "x").getItem(0).cast(IntegerType))
      .otherwise(patchType.cast(IntegerType))

  /** Header extraction (P1, watch_dog.py:244-272,335-351): typed columns out
    * of the two FITS header maps, including the derived chan0. Missing keys
    * fail fast via assert_true, mirroring the reference's KeyError. */
  def withHeaderFields(images: DataFrame): Column => DataFrame = { idCol =>
    images
      .withColumn("img_time",
        to_timestamp(hdr("img_hdr", "DATETIME"),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withColumn("xdim", hdrI("img_hdr", "NAXIS1"))
      .withColumn("ydim", hdrI("img_hdr", "NAXIS2"))
      .withColumn("n_chan", hdrI("img_hdr", "NAXIS3"))
      .withColumn("n_pol", hdrI("img_hdr", "NAXIS4"))
      .withColumn("ra0", hdrD("img_hdr", "CRVAL1"))
      .withColumn("dec0", hdrD("img_hdr", "CRVAL2"))
      .withColumn("crpix1", hdrD("img_hdr", "CRPIX1"))
      .withColumn("crpix2", hdrD("img_hdr", "CRPIX2"))
      .withColumn("cdelt1", hdrD("img_hdr", "CDELT1"))
      .withColumn("cdelt2", hdrD("img_hdr", "CDELT2"))
      .withColumn("chan0",
        hdrD("img_hdr", "CRVAL3") -
          hdrD("img_hdr", "CDELT3") * hdrD("img_hdr", "CRPIX3"))
      .withColumn("chan_bw", hdrD("img_hdr", "CDELT3"))
      .withColumn("int_time", hdrD("primary_hdr", "INTTIM"))
      .withColumn("img_id", idCol)
  }

  /** Deterministic epoch id: stable across actions and task retries. */
  def epochId: Column =
    md5(concat_ws("|", hdr("img_hdr", "DATETIME"),
      coalesce(hdr("img_hdr", "FILENAME"), lit(""))))

  /** Full pipeline: (pixels, metadata) frames.
    *
    * @param images decoded image cubes (imageSchema)
    * @param watchlist current active watchlist (watchSchema) — small; broadcast
    * @param elevationLimitDeg FOV elevation cut (30° default,
    *        uds_server.py:117)
    * @param epicVersion engine version tag for the metadata rows
    */
  /** P9: sources named after solar-system bodies get their (ra, dec)
    * replaced by the ephemeris position at the image timestamp
    * (watch_dog.py:500-509). Deterministic scalar UDF — evaluated ONCE per
    * (body, distinct timestamp) on a tiny frame that is then broadcast-
    * joined back; putting the UDF on the big image×watch frame would both
    * re-evaluate it per downstream reference (projection collapse inlines
    * it into every patch-offset lambda) and break whole-stage codegen. */
  case class EphPos(ra: Double, dec: Double)
  private val ephemerisUdf = udf((name: String, t: java.sql.Timestamp) =>
    Ephemeris.position(name, t).map(p => EphPos(p._1, p._2)))

  /** watch × distinct(img_time) with body positions resolved. */
  def resolveBodies(watchProj: DataFrame, times: DataFrame): DataFrame =
    times.crossJoin(watchProj)
      .withColumn("eph",
        ephemerisUdf(lower(col("source_name")), col("img_time")))
      .withColumn("src_ra", coalesce(col("eph.ra"), col("src_ra")))
      .withColumn("src_dec", coalesce(col("eph.dec"), col("src_dec")))
      .drop("eph")

  def pixelsAndMeta(images: DataFrame, watchlist: DataFrame,
      elevationLimitDeg: Double = 30.0,
      epicVersion: String = "graft-0.1",
      ephemeris: Boolean = true): (DataFrame, DataFrame) = {

    val hdrImages = withHeaderFields(images)(epochId)

    // J1: stream–static broadcast join — every image × every watched source.
    val watchProj = watchlist.select(
      col("id").as("src_id"), col("source_name"),
      col("ra").as("src_ra"), col("dec").as("src_dec"),
      patchSize(col("patch_type")).as("psize"))
    val joined = if (ephemeris) {
      // broadcast hash join on img_time: ephemeris resolved per distinct
      // timestamp (watch × times is tiny), image rows never see the UDF
      val times = hdrImages.select(col("img_time")).distinct()
      hdrImages.join(broadcast(resolveBodies(watchProj, times)), "img_time")
    } else {
      hdrImages.crossJoin(broadcast(watchProj))
    }

    // P5+P4: sky → 1-based float pixel → nearest-pix integer (0-based).
    val maxRad = col("xdim") * 0.5d *
      lit(math.cos(math.toRadians(elevationLimitDeg)))
    val located = joined
      .withColumn("w2p", Wcs.world2pix(col("src_ra"), col("src_dec"),
        col("ra0"), col("dec0"), col("crpix1"), col("crpix2"),
        col("cdelt1"), col("cdelt2")))
      .withColumn("cx", Wcs.nearestPix(col("w2p.x")) - 1d)
      .withColumn("cy", Wcs.nearestPix(col("w2p.y")) - 1d)

    // P6 pre-explode FOV mask on the patch CENTER (prunes n²× work before
    // the explode — the placement the reference hand-codes at
    // watch_dog.py:383-403 and Catalyst keeps because the predicate only
    // uses pre-explode columns).
    val centered = located.where(
      !isnan(col("w2p.x")) && !isnan(col("w2p.y")) &&
        col("cx") >= 0d && col("cy") >= 0d &&
        sqrt(pow(col("cx") - col("xdim") / 2d, 2d) +
          pow(col("cy") - col("ydim") / 2d, 2d)) <= maxRad)

    // G1: patch offsets — n×n relative offsets (meshgrid as a nested
    // transform, one array<struct<dx,dy>> per source).
    val half = (col("psize") / 2).cast(IntegerType)
    val offsets = flatten(transform(sequence(-half, half),
      dx => transform(sequence(-half, half),
        dy => struct(dx.as("dx"), dy.as("dy")))))

    // per-pixel FOV/NaN predicate (P5 inverse validity + bounds + radius —
    // the reference's post-explode mask, watch_dog.py:422-424)
    def pixelInFov(px: Column, py: Column): Column = {
      val sky = Wcs.pix2world(px + 1d, py + 1d,
        col("ra0"), col("dec0"), col("crpix1"), col("crpix2"),
        col("cdelt1"), col("cdelt2"))
      !isnan(sky.getField("ra")) && !isnan(sky.getField("dec")) &&
        px >= 0d && py >= 0d && px < col("xdim") && py < col("ydim") &&
        sqrt(pow(px - col("xdim") / 2d, 2d) +
          pow(py - col("ydim") / 2d, 2d)) <= maxRad
    }

    // A1: all-or-nothing patch filter (watch_dog.py:426-440), evaluated as
    // forall over the offsets array BEFORE the explode. Same semantics as
    // the reference's post-explode group-ALL (a patch survives iff every
    // pixel passes), but expressed pre-explode it needs NO shuffle — the
    // reference pays a per-image sort/split, a window would shuffle every
    // exploded row together with its multi-MB image column — and failing
    // patches never explode at all.
    val kept = centered.where(
      forall(offsets, o =>
        pixelInFov(col("cx") + o.getField("dx"),
          col("cy") + o.getField("dy"))))

    // J3: whole-patch pixel gather, evaluated per patch while the row count
    // is still one-per-(image, source) — flat offset into the row-major
    // [complex, npol, nchan, y, x] cube is (k·ydim + py)·xdim + px for
    // k = (c·npol + p)·nchan + ch (watch_dog.py:442-455). One PatchGather
    // call per row binds the cube ONCE and emits the full n² grid (a
    // per-pixel StridedGather inside a transform() lambda re-copied the
    // multi-MB blob per offset — ~12 GB of garbage per 256-image batch).
    // The OptimizerFence stops InferFiltersFromGenerate from cloning the
    // gather into a pre-explode `size(…) > 0` guard (see its scaladoc).
    // CRITICAL layout decision: the multi-MB `image` column is dropped
    // BEFORE the explode — exploding first would replicate the whole cube
    // into every one of the n² pixel rows (observed 6× slowdown).
    val planes = (lit(2) * col("n_pol") * col("n_chan")).cast(IntegerType)
    val gatheredPatch = kept
      .withColumn("pixel_data", graft.plans.OptimizerFence(
        graft.plans.PatchGather(col("image"), planes,
          col("cy"), col("cx"), half, col("ydim"), col("xdim"))))
      .drop("image")

    // explode the (offset, values) structs; per-pixel sky position for the
    // output rows (P5 inverse — valid by construction after the A1 filter)
    val withSky = gatheredPatch
      .withColumn("pd", explode(col("pixel_data")))
      .withColumn("px", col("cx") + col("pd.dx"))
      .withColumn("py", col("cy") + col("pd.dy"))
      .withColumn("p2w", Wcs.pix2world(col("px") + 1d, col("py") + 1d,
        col("ra0"), col("dec0"), col("crpix1"), col("crpix2"),
        col("cdelt1"), col("cdelt2")))

    // P7/P8: typed output points; lm from pure arithmetic.
    val ipx = col("px").cast(IntegerType)
    val ipy = col("py").cast(IntegerType)
    val pixels = withSky.select(
      col("img_id").as("id"),
      struct(ipx.as("x"), ipy.as("y")).as("pixel_coord"),
      col("pd.values").as("pixel_values"),
      struct(col("p2w.ra").as("ra"), col("p2w.dec").as("dec"))
        .as("pixel_skypos"),
      col("source_name").as("source_names"),
      struct(Wcs.pixelToLm(col("px"), col("xdim")).as("l"),
        Wcs.pixelToLm(col("py"), col("ydim")).as("m")).as("pixel_lm"),
      col("pd.dx").as("pix_ofst_x"),
      col("pd.dy").as("pix_ofst_y"))

    // P1+A2: one metadata row per image that produced pixels (store_pg
    // early-return: no pixels ⇒ no metadata row, watch_dog.py:354-357).
    // Derived from the pre-explode patch frame: a surviving patch implies
    // its n² pixel rows exist, so the explode never runs for metadata.
    val meta = kept
      .groupBy(col("img_id").as("id"))
      .agg(
        first(col("img_time")).as("img_time"),
        first(col("n_chan")).as("n_chan"),
        first(col("n_pol")).as("n_pol"),
        first(col("chan0")).as("chan0"),
        first(col("chan_bw")).as("chan_bw"),
        first(col("xdim")).as("xdim"),
        first(col("ydim")).as("ydim"),
        first(col("int_time")).as("int_time"),
        array_sort(collect_set(col("source_name"))).as("source_names"))
      .select(col("id"), col("img_time"), col("n_chan"), col("n_pol"),
        col("chan0"), col("chan_bw"),
        lit(epicVersion).as("epic_version"),
        struct(col("xdim").as("x"), col("ydim").as("y")).as("img_size"),
        col("int_time"), col("source_names"))

    (pixels, meta)
  }

  /** EWKT / PG-point formatting for the JDBC boundary only (P7,
    * watch_dog.py:457-477): internal representation stays typed structs. */
  def toPgStrings(pixels: DataFrame): DataFrame = pixels
    .withColumn("pixel_coord",
      format_string("(%d,%d)", col("pixel_coord.x"), col("pixel_coord.y")))
    .withColumn("pixel_values",
      concat(lit("{"), array_join(col("pixel_values"), ","), lit("}")))
    .withColumn("pixel_skypos",
      format_string("SRID=4326;POINT(%s %s)",
        col("pixel_skypos.ra"), col("pixel_skypos.dec")))
    .withColumn("pixel_lm",
      format_string("(%s,%s)", col("pixel_lm.l"), col("pixel_lm.m")))

  /** Metadata-side sink formatting: struct/array columns become the PG
    * literals the reference writes (pg_pixel_storage.py epic_img_metadata
    * columns) so every cell is a plain JDBC scalar. */
  def metaToPgStrings(meta: DataFrame): DataFrame = meta
    .withColumn("img_size",
      format_string("(%d,%d)", col("img_size.x"), col("img_size.y")))
    .withColumn("source_names",
      concat(lit("{"), array_join(col("source_names"), ","), lit("}")))
}
