package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev probe: time the BATCH search (s11's shape — probe set = every
  * 7th vector, ptMod from the standing layout) against a REUSED
  * standing graph, without paying the stage build. Used in r12 to
  * isolate the x100 batch tail (ScaleProbe read s11 exp 1.31 over
  * x10→x100 where x10→x30 reads 0.69) to the silent
  * auto-broadcast-threshold crossover of the query-vector side in
  * score(): at |Q| = 28.6k the qVecs frame is ~14 MB > the 10 MB
  * default, the q-join degrades to a shuffle join, and the per-hop
  * candidate intermediate exchanges by q CARRYING the 0.5 KB corpus
  * vector — the wide-column-rides-shuffle class the r11 slim-frontier
  * fix removed from the frontier side. Run:
  * `sbt "Test/runMain graft.operators.BatchSearchProbe <table> <dir>
  * <runs>"` (SPARK_GRAFT_SERVE_REUSE-style registration included). */
object BatchSearchProbe {

  def main(args: Array[String]): Unit = {
    val table = args(0)
    val dir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
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
    val qs = e.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("q"), col("v").as("qv"),
        col("nrm").as("qn"))
    val m = HnswGraph.mFor(n)
    println(s"[bsp] n=$n |Q|=${qs.count()} m=$m ptMod=$ptMod")
    HnswGraph.search(adj, e, qs, ptMod = ptMod).count() // warm
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      HnswGraph.search(adj, e, qs, ptMod = ptMod).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[bsp] batch search: min=${ts.min}%.2f s runs=" +
      ts.map(t => f"$t%.2f").mkString("/"))
    spark.stop()
  }
}
