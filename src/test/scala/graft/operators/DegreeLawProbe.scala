package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev probe: the r14 verdict's DEGREE-LAW settlement — build the big
  * corpus at an EXPLICIT degree `m` (not [[HnswGraph.mFor]]'s answer),
  * persist it as `serve_probe_x<mult>_m<m>`, then read recall@5 with
  * the SAME frozen probe slice as [[S12FixedProbe]]
  * (`vec_id % 7 = 0 AND vec_id < 20000`, |Q| = 2857) so the number is
  * directly comparable to the recorded law points
  * (0.961/0.936/0.915/0.8818 at x10/x30/x100/x300, SCALING_r14.json).
  * The x300 question: does m=51 (step 6 on the final doubling) restore
  * the 0.9 floor that m=46 (the mFor law) measurably broke?
  *
  * Also reports the 5-query pruned serving wall on the standing table,
  * so the cost side of a law change is measured in the same run.
  *
  * Run: `sbt "Test/runMain graft.operators.DegreeLawProbe <out.json>
  * <mult:dir> <mList>"` with SPARK_DRIVER_MEM=64g
  * SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_GRAFT_BUILD_SQ8=1 for x300
  * (the r14 build recipe). Standing tables are reused when present
  * (SPARK_GRAFT_SERVE_REUSE=1), so a recall re-read costs no build. */
object DegreeLawProbe {

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val Array(multS, dir) = args(1).split(":", 2)
    val mult = multS.toLong
    val ms = args(2).split(",").toSeq.map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    val n = e.count()
    val ptMod = HnswGraph.ptFor(n)
    val probeCap = 20000L
    val sq8 = sys.env.get("SPARK_GRAFT_BUILD_SQ8").contains("1")
    val reuse = sys.env.get("SPARK_GRAFT_SERVE_REUSE").contains("1")

    def frozenRecall(adj: DataFrame): Double = {
      val qs = e.where(col("vec_id") % 7 === 0 && col("vec_id") < probeCap)
        .select(col("vec_id").as("q"), col("v").as("qv"),
          col("nrm").as("qn"))
      val ann = HnswGraph.search(adj, e, qs, ptMod = ptMod)
        .select(col("q").as("aq"), col("nb").as("anb"))
      val w = Window.partitionBy(col("q"))
        .orderBy(col("sim").desc, col("nb"))
      val brute = qs.join(e, col("vec_id") =!= col("q"))
        .select(col("q"), col("vec_id").as("nb"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
            .as("sim"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5)
        .select(col("q"), col("nb"))
      brute.join(ann,
          col("q") === col("aq") && col("nb") === col("anb"), "left")
        .agg(count(col("anb")).cast("double") / count(lit(1)))
        .head().getDouble(0)
    }

    val rows = ms.map { m =>
      val table = s"serve_probe_x${mult}_m$m"
      if (reuse && !spark.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) {
          spark.sql(s"CREATE TABLE `$table` USING parquet LOCATION '$loc'")
          spark.sql(s"MSCK REPAIR TABLE `$table`")
        }
      }
      val buildSec = if (reuse && spark.catalog.tableExists(table)) 0.0
      else {
        SnapshotMerge.dropTableAndLocation(spark, table)
        val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n))
        val tb0 = System.nanoTime()
        HnswGraph.writeGraph(HnswGraph.build(e, cells, m = m,
          stride = HnswGraph.strideFor(n), sq8 = sq8), table, n)
        (System.nanoTime() - tb0) / 1e9
      }
      val adj = spark.table(table)
      val l0 = adj.where(col("layer") === 0).count()
      println(f"[degreelaw] x$mult m=$m built in $buildSec%.1fs " +
        s"l0_edges=$l0 (sq8=$sq8)")
      val recall = frozenRecall(adj)
      println(f"[degreelaw] x$mult m=$m recall@5=$recall%.4f " +
        s"(frozen probe, |Q|=2857)")
      // 5-query pruned serving wall on the standing table (warm + min3)
      val qs5 = e.where(col("vec_id").isin(3L, 71L, 500L, 999L, 1332L))
        .select(col("vec_id").as("q"), col("v").as("qv"),
          col("nrm").as("qn")).persist()
      qs5.count()
      def serve(): Double = {
        val t0 = System.nanoTime()
        HnswGraph.search(adj, e, qs5, ptMod = ptMod,
          serving = true).count()
        (System.nanoTime() - t0) / 1e9
      }
      serve()
      val tServe = (1 to 3).map(_ => serve()).min
      qs5.unpersist()
      println(f"[degreelaw] x$mult m=$m serve_5q=$tServe%.2fs")
      f""""m$m":{"m":$m,"build_sec":$buildSec%.1f,"l0_edges":$l0,""" +
        f""""recall_at_5":$recall%.4f,"serve_5q_pruned_sec":$tServe%.3f}"""
    }
    val json =
      s"""{"metric":"degree_law_probe","mult":$mult,"n":$n,""" +
      s""""probe_cap":$probeCap,"sq8":$sq8,${rows.mkString(",")}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
