package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark,
    Tables.load(spark, sf0001, "documents"))

  test("media table has the typed binary + metadata schema") {
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() > 0)
    val kinds = media.select("kind").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode is deterministic and partitioning-independent") {
    val a = Multimodal.decoded(media).collect()
      .map(f => f.media_id -> f.pixels.toSeq).toMap
    val b = Multimodal.decoded(media, partitions = 7).collect()
      .map(f => f.media_id -> f.pixels.toSeq).toMap
    assert(a == b)
    val f = Multimodal.decoded(media).head()
    assert(f.pixels.length == f.width * f.height)
    assert(f.pixels.forall(p => p >= 0f && p < 1f))
  }

  test("frame sampling yields every n-th frame per video") {
    val vids = media.where(col("kind") === "video")
    val expect = vids.select(
      ((col("meta.n_frames") + 1) / lit(2)).cast("int"))
      .collect().map(_.getInt(0).toLong).sum
    val frames = Multimodal.sampledFrames(media, everyN = 2)
    assert(frames.count() == expect)
    // frame indices are 0, 2, 4, …
    assert(frames.collect().forall(_.frame_idx % 2 == 0))
  }

  test("resize preserves global mean approximately (area average)") {
    val one = Multimodal.decoded(media.limit(1))
    val f = one.head()
    val r = Multimodal.resized(one, 8, 8).head()
    assert(r.pixels.length == 64)
    val m0 = f.pixels.map(_.toDouble).sum / f.pixels.length
    val m1 = r.pixels.map(_.toDouble).sum / r.pixels.length
    assert(math.abs(m0 - m1) < 0.1, s"$m0 vs $m1")
  }

  test("features are stable and bounded") {
    val feats = Multimodal.features(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.px_mean > 0.2 && f.px_mean < 0.8) // uniform-ish fake pixels
      assert(f.px_min >= 0.0 && f.px_max < 1.0)
      assert(f.px_std > 0.0)
    }
  }

  // ---- real codec (javax.imageio) ---------------------------------------

  /** 4×4 grayscale PNG with pixel i = gray level i·17 (0, 17, …, 255) —
    * luma of an (v,v,v) pixel is exactly v/255, so every expectation
    * below is hand-computable. */
  private def gradientPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (i <- 0 until 16) {
      val v = i * 17
      img.setRGB(i % 4, i / 4, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, p) =>
        Row(id, "image", p, Row("png", null, null, null, null))
      }, 2), Multimodal.mediaSchema)
  }

  test("real PNG bytes decode through the same plumbing (m01/m02 path): " +
      "dims from the bytes, hand-computed features") {
    val m = mediaOf(1L -> gradientPng())
    val f = Multimodal.decodedReal(m).head()
    assert(f.width === 4 && f.height === 4 && f.pixels.length === 16)
    // pixel i is gray i*17 → luma i/15 (within float/luma-weight eps)
    for (i <- 0 until 16)
      assert(math.abs(f.pixels(i) - i / 15.0) < 1e-6, s"pixel $i")
    val feat = Multimodal.featuresReal(m).head()
    // mean of 0/15..15/15 = 0.5; var = E[i²]/225 − 0.25 = 77.5/225 − 0.25
    assert(math.abs(feat.px_mean - 0.5) < 1e-6)
    assert(math.abs(feat.px_std -
      math.sqrt(1240.0 / 16 / 225 - 0.25)) < 1e-6)
    assert(math.abs(feat.px_min - 0.0) < 1e-6)
    assert(math.abs(feat.px_max - 1.0) < 1e-6)
    assert(feat.width === 4 && feat.height === 4)
  }

  test("real decode + area-average resize (m04 path): 2×2 block means") {
    val m = mediaOf(1L -> gradientPng())
    val r = Multimodal.resized(Multimodal.decodedReal(m), 2, 2).head()
    assert(r.width === 2 && r.height === 2)
    // block means over the gradient: {0,1,4,5}/15, {2,3,6,7}/15, …
    val want = Seq(2.5 / 15, 4.5 / 15, 10.5 / 15, 12.5 / 15)
    r.pixels.toSeq.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-6, s"block $i: $got vs $w")
    }
  }

  test("real decode + ahash dedup (m05 path): byte-identical images " +
      "bucket together, a different image does not") {
    val png = gradientPng()
    // a visually different image: inverted gradient
    val inv = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (i <- 0 until 16) {
        val v = 255 - i * 17
        img.setRGB(i % 4, i / 4, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val m = mediaOf(1L -> png, 2L -> png, 3L -> inv)
    // the m05 signature arithmetic over REAL pixels: 4×4 resize → mean →
    // 16-bit above-mean signature → groupBy
    val small = Multimodal.resized(Multimodal.decodedReal(m), 4, 4).toDF()
    val mean = aggregate(col("pixels"), lit(0.0d),
      (a, x) => a + x.cast("double")) / lit(16.0d)
    val bits = (0 until 16).map(i =>
      when(element_at(col("pixels"), i + 1).cast("double") > col("mean"),
        lit(1L << i)).otherwise(lit(0L)))
    val hashed = small.select(col("media_id"), mean.as("mean"),
        col("pixels"))
      .withColumn("ahash", bits.reduce(_ + _))
      .select("media_id", "ahash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) === hashed(2L), "identical bytes must share ahash")
    assert(hashed(1L) !== hashed(3L), "inverted image must differ")
  }

  test("real codec rejects undecodable payloads loudly") {
    val m = mediaOf(1L -> "this is not a png".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodedReal(m).collect()
    }
    assert(e.getMessage.contains("decodable") ||
      Option(e.getCause).exists(_.getMessage.contains("decodable")))
  }
}
