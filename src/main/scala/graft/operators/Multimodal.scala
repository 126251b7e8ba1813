package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column operators for training-data
  * pipelines: payloads are opaque `binary` columns + a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run batch-wise
  * over partitions (`mapPartitions` on a typed Dataset — the JVM analog of
  * `mapInPandas`: one iterator per partition, vectorizable batch shape, no
  * per-row UDF dispatch).
  *
  * Two codecs behind one plumbing:
  *  - `FakeCodec` (oracle path): synthesizes pixels from a rolling hash of
  *    the payload — deterministic, lattice-exact, bit-replayable in DuckDB,
  *    which is what lets m01–m05 be hash-gated;
  *  - `ImageIoCodec` (real path, [[decodedReal]]/[[featuresReal]]): JDK
  *    `javax.imageio` PNG/JPEG decode to grayscale — real bytes through
  *    the same schemas, partition iterators, resize arithmetic, feature
  *    math, and ahash; spec-verified with hand-computed expectations
  *    (a real codec cannot be replayed by the SQL oracle). Audio/video
  *    (ffmpeg-class) codecs would slot in the same way.
  *
  * Scale notes: decode is the expensive narrow stage — `decoded(df, n)`
  * repartitions by media_id first so a 100 TB corpus decodes
  * embarrassingly parallel with no skew from source file layout, and the
  * binary column never shuffles after decode (features/resize fuse into
  * the same stage).
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),   // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      format: String, width: Int, height: Int, sample_rate: Int,
      n_frames: Int)

  case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
      height: Int, pixels: Array[Float])

  case class MediaFeatures(media_id: Long, n_bytes: Int, width: Int,
      height: Int, px_mean: Double, px_std: Double, px_min: Double,
      px_max: Double)

  /** DETERMINISTIC FAKE CODEC — stands in for imageio/ffmpeg. Pixel (i) of
    * a (w×h) frame is an affine-modular hash of (payloadSeed, frameIdx, i)
    * scaled to [0,1). The same payload always decodes to the same pixels,
    * on any partitioning.
    *
    * All arithmetic is mod 1e9+7 with the payload seed being exactly the
    * PolyHash text fingerprint (fold (h*31+byte) % 1e9+7, zero init) — so
    * every derived feature is expressible in ANSI SQL and the DuckDB
    * oracle can replay the decode bit-for-bit (see LlmQueries m02). */
  object FakeCodec {
    val Mod = 1000000007L

    /** Pixel values live on a 1021-point lattice: k ∈ [0,1021) and
      * pixel = k/1021. Integer sums of k and k² stay exact in a Long
      * (≤ 768 px/frame), so aggregate features are order-independent. */
    val Lattice = 1021L

    def payloadSeed(payload: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xffL)) % Mod
        i += 1
      }
      h
    }

    /** lattice index of pixel i of frame frameIdx. */
    def pixelK(seed: Long, frameIdx: Int, i: Int): Long =
      (seed * (2L * frameIdx + 3L) + (i + 1L) * 1000003L) % Mod % Lattice

    /** decode one frame: in a real build this calls the codec. */
    def decodeFrame(payload: Array[Byte], frameIdx: Int,
        w: Int, h: Int): Array[Float] = {
      val seed = payloadSeed(payload)
      val out = new Array[Float](w * h)
      var i = 0
      while (i < out.length) {
        out(i) = (pixelK(seed, frameIdx, i) / 1021.0).toFloat
        i += 1
      }
      out
    }
  }

  /** REAL codec: JDK-built-in `javax.imageio` PNG/JPEG decode to grayscale
    * [0,1] floats (ITU-R BT.601 luma — the standard RGB→gray weights).
    * Same partition-iterator plumbing, same DecodedFrame shape; width and
    * height come from the decoded image itself, not the metadata column
    * (a real corpus's metadata can lie — the bytes cannot). The DuckDB
    * oracle cannot replay a real codec, so oracle-gated queries (m01-m05)
    * stay on [[FakeCodec]]; `MultimodalSpec` drives REAL PNG bytes through
    * the decode → features → resize → ahash paths with hand-computed
    * expectations instead. */
  object ImageIoCodec {
    /** (width, height, grayscale pixels row-major). */
    def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(y * w + x) =
            ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  /** Decode stage over REAL image bytes (PNG/JPEG via [[ImageIoCodec]]):
    * identical repartition + partition-iterator shape as [[decoded]] —
    * swapping codecs changes no plan. Still images only (frame_idx 0). */
  def decodedReal(media: DataFrame, partitions: Int = 0): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    val repart = if (partitions > 0)
      rows.repartition(partitions, col("media_id")) else rows
    repart.mapPartitions { batch =>
      batch.map { case (id, payload) =>
        val (w, h, px) = ImageIoCodec.decodeImage(payload)
        DecodedFrame(id, 0, w, h, px)
      }
    }
  }

  /** Per-asset features over REAL decoded frames — double stats straight
    * off the pixels (no oracle lattice; the real-codec twin of
    * [[features]]). */
  def featuresReal(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (w, h, px) = ImageIoCodec.decodeImage(payload)
          var s = 0.0; var s2 = 0.0
          var mn = Double.MaxValue; var mx = Double.MinValue
          var i = 0
          while (i < px.length) {
            val v = px(i).toDouble
            s += v; s2 += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = px.length
          val mean = s / n
          MediaFeatures(id, payload.length, w, h, round6(mean),
            round6(math.sqrt(math.max(0, s2 / n - mean * mean))),
            round6(mn), round6(mx))
        }
      }
  }

  /** Decode stage: repartition by media_id (decode parallelism independent
    * of file layout), then one batch-iterator pass per partition. */
  def decoded(media: DataFrame, partitions: Int = 0): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("media_id"), col("kind"), col("payload"),
      col("meta.format").as("format"),
      coalesce(col("meta.width"), lit(16)).as("width"),
      coalesce(col("meta.height"), lit(16)).as("height"),
      coalesce(col("meta.sample_rate"), lit(0)).as("sample_rate"),
      coalesce(col("meta.n_frames"), lit(1)).as("n_frames"))
      .as[MediaRow]
    val repart = if (partitions > 0)
      rows.repartition(partitions, col("media_id")) else rows
    repart.mapPartitions { batch =>
      batch.map { m =>
        DecodedFrame(m.media_id, 0, m.width, m.height,
          FakeCodec.decodeFrame(m.payload, 0, m.width, m.height))
      }
    }
  }

  /** Video frame sampling: every n-th frame of each asset, decoded —
    * explode on the driver plan, decode in the partition iterator. */
  def sampledFrames(media: DataFrame, everyN: Int): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.where(col("kind") === "video")
      .select(col("media_id"), col("kind"), col("payload"),
        col("meta.format").as("format"),
        coalesce(col("meta.width"), lit(16)).as("width"),
        coalesce(col("meta.height"), lit(16)).as("height"),
        coalesce(col("meta.sample_rate"), lit(0)).as("sample_rate"),
        coalesce(col("meta.n_frames"), lit(1)).as("n_frames"))
      .as[MediaRow]
    rows.mapPartitions { batch =>
      batch.flatMap { m =>
        (0 until m.n_frames by math.max(everyN, 1)).iterator.map { fi =>
          DecodedFrame(m.media_id, fi, m.width, m.height,
            FakeCodec.decodeFrame(m.payload, fi, m.width, m.height))
        }
      }
    }
  }

  /** Area-average resize of decoded frames to (tw × th) — real arithmetic
    * over the (fake-)decoded pixels. */
  def resized(frames: Dataset[DecodedFrame], tw: Int, th: Int): Dataset[DecodedFrame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { batch =>
      batch.map { f =>
        val out = new Array[Float](tw * th)
        var ty = 0
        while (ty < th) {
          val y0 = ty * f.height / th
          val y1 = math.max(y0 + 1, (ty + 1) * f.height / th)
          var tx = 0
          while (tx < tw) {
            val x0 = tx * f.width / tw
            val x1 = math.max(x0 + 1, (tx + 1) * f.width / tw)
            var s = 0.0; var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += f.pixels(y * f.width + x); n += 1; x += 1 }
              y += 1
            }
            out(ty * tw + tx) = (s / n).toFloat
            tx += 1
          }
          ty += 1
        }
        DecodedFrame(f.media_id, f.frame_idx, tw, th, out)
      }
    }
  }

  /** round-half-up to 6 places — same behavior as Spark's and DuckDB's
    * round(x, 6) on non-negative doubles, so oracle hashes agree. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-asset features over the decoded frame (mean/std/min/max).
    * Stats are accumulated on the exact integer pixel lattice (Σk, Σk²
    * fit a Long) and converted to double once at the end — the identical
    * expression the DuckDB oracle computes, so results are bit-equal and
    * independent of partitioning/summation order. */
  def features(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("media_id"), col("kind"), col("payload"),
      col("meta.format").as("format"),
      coalesce(col("meta.width"), lit(16)).as("width"),
      coalesce(col("meta.height"), lit(16)).as("height"),
      coalesce(col("meta.sample_rate"), lit(0)).as("sample_rate"),
      coalesce(col("meta.n_frames"), lit(1)).as("n_frames"))
      .as[MediaRow]
    rows.mapPartitions { batch =>
      batch.map { m =>
        val seed = FakeCodec.payloadSeed(m.payload)
        val n = m.width * m.height
        var s = 0L; var s2 = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < n) {
          val k = FakeCodec.pixelK(seed, 0, i)
          s += k; s2 += k * k
          if (k < mn) mn = k
          if (k > mx) mx = k
          i += 1
        }
        val lat = FakeCodec.Lattice.toDouble
        val mean = s.toDouble / (n * lat)
        val msq = s2.toDouble / (n * lat * lat)
        MediaFeatures(m.media_id, m.payload.length, m.width, m.height,
          round6(mean), round6(math.sqrt(math.max(0, msq - mean * mean))),
          round6(mn.toDouble / lat), round6(mx.toDouble / lat))
      }
    }
  }

  /** Build a media table from the documents fixture (text bytes as payload
    * — the pattern a real corpus uses with actual image/audio bytes). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(lit("fake").as("format"),
        (col("n_chars") % 24 + 8).cast(IntegerType).as("width"),
        (col("n_chars") % 16 + 8).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (col("doc_id") % 7 + 1).cast(IntegerType).as("n_frames"))
        .as("meta"))
}
