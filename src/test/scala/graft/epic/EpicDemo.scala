package graft.epic

import org.apache.spark.sql.SparkSession

/** Manual harness: drives the EPIC pipeline through its public API and
  * prints the output frames. Run: sbt "Test/runMain graft.epic.EpicDemo" */
object EpicDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.ForkFreeLocalFileSystem").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val images = ImageFixtures.imagesDf(spark,
      Seq("2022-08-31T23:29:10.000000", "2022-08-31T23:29:11.000000"))
    val (pixels, meta) =
      EpicPipeline.pixelsAndMeta(images, ImageFixtures.watchlistDf(spark))
    println("=== pixels (sample) ===")
    pixels.show(6, truncate = 60)
    println("pixels total: " + pixels.count())
    println("=== metadata ===")
    meta.show(20, truncate = 60)
    println("=== PG-formatted sink rows ===")
    EpicPipeline.toPgStrings(pixels)
      .select("pixel_coord", "pixel_skypos", "pixel_lm")
      .show(3, truncate = 60)
    spark.stop()
  }
}
