package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev tool: the s11 recall/cost curve over the fixed beam-schedule
  * knobs (efUpper, ef0, layer-0 hops) at a given corpus scale — the
  * measurement behind [[HnswGraph.search]]'s defaults (recorded in
  * BASELINE.md). Run with
  * `sbt "Test/runMain graft.operators.HnswSweep [sfDir|xN]"`:
  * builds the graph once, then times each schedule and reports its
  * recall@5 against the brute-force answer over the same probe set.
  */
object HnswSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    val n = e.count()
    println(s"corpus: $n vectors from $dir")

    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n)).persist()
    val stride = HnswGraph.strideFor(n)
    val qs = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
      .persist()
    val nQ = qs.count()

    // brute top-5 ground truth, once
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("nb"))
    val brute = qs.join(e, col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("nb"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select(col("q"), col("nb"))
      .persist()
    brute.count()

    for (m <- args.lift(1).map(_.split(",").toSeq.map(_.toInt))
        .getOrElse(Seq(6))) {
      val t0 = System.nanoTime()
      val adj = HnswGraph.build(e, cells, m = m, stride = stride).persist()
      val edges = adj.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(f"m=$m build: $edges edges in $tBuild%.1f s")
      def intsAt(i: Int, dflt: Seq[Int]) =
        args.lift(i).map(_.split(",").toSeq.map(_.toInt)).getOrElse(dflt)
      for {
        efUpper <- intsAt(2, Seq(4, 8))
        ef0 <- intsAt(3, Seq(32, 48))
        hops0 <- intsAt(4, Seq(3, 4, 5))
      } {
        val t1 = System.nanoTime()
        val ann = HnswGraph.search(adj, e, qs, efUpper = efUpper,
          ef0 = ef0, hops0 = hops0)
          .select(col("q"), col("nb"))
        val hits = ann.intersect(brute).count()
        val secs = (System.nanoTime() - t1) / 1e9
        val recall = hits.toDouble / (5.0 * nQ)
        println(f"m=$m efUpper=$efUpper ef0=$ef0%2d " +
          f"hops0=$hops0 recall@5=$recall%.3f search=$secs%.2f s")
      }
      adj.unpersist()
    }
    spark.stop()
  }
}
