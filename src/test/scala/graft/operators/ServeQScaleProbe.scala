package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev probe: driver-beam serving wall time vs MICRO-BATCH SIZE on a
  * standing graph — the throughput reading behind the serving story
  * (r12): per-trigger cost is dominated by the 7 fused jobs'
  * scheduling constant, so queries/sec should RISE with |Q| until the
  * per-hop candidate volume (|Q|·ef0·2m rows) starts to bite. Run:
  * `sbt "Test/runMain graft.operators.ServeQScaleProbe <out.json>
  * <table> <dir>"` against a reused ServeProbe table. */
object ServeQScaleProbe {

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val table = args(1)
    val dir = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(loc), s"no standing table dir $loc")
      spark.sql(s"CREATE TABLE `$table` USING parquet LOCATION '$loc'")
      spark.sql(s"MSCK REPAIR TABLE `$table`")
    }
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist()
    val n = e.count()
    val adj = spark.table(table)
    val ptMod = HnswGraph.ptFor(n)
    def qsOf(q: Int) = e.where(col("vec_id") % (n / q) === 3)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    HnswGraph.search(adj, e, qsOf(5), ptMod = ptMod,
      serving = true).count() // warm
    val rows = Seq(1, 5, 32, 128, 512).map { q =>
      val qs = qsOf(q)
      val nQ = qs.count()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        HnswGraph.search(adj, e, qs, ptMod = ptMod,
          serving = true).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[qscale] |Q|=$nQ wall=$t%.2fs -> ${nQ / t}%.1f q/s")
      (nQ, t)
    }
    val json = s"""{"metric":"serving_qscale","n":$n,"table":"$table",""" +
      rows.map { case (q, t) =>
        f""""q$q":{"wall_sec":$t%.3f,"qps":${q / t}%.1f}"""
      }.mkString("", ",", "}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
