package graft

import org.apache.spark.sql.SparkSession

/** One-query runner: `runMain graft.RunQuery <query_name> <sf_dir>
  * [max_rows]` executes a single `SparkEntry.queries` entry and prints
  * the result — the REPL-free way to inspect any declared query on any
  * corpus directory (driver testdata or a [[ScaleData]] corpus). */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-run-$name")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    df.show(maxRows, truncate = false)
    println(f"[runquery] $name on $dir: $n rows in $secs%.2f s")
    spark.stop()
  }
}
