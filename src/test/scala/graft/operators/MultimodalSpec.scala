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
}
