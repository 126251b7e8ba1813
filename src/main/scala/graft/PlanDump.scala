package graft

import org.apache.spark.sql.SparkSession

/** Plan capture: `runMain graft.PlanDump <out_dir> <suffix> [names]`
  * writes `<out_dir>/<query>_<suffix>.txt` with the `.explain("formatted")`
  * output of each named query (default: every SparkEntry query) over
  * `$SPARK_GRAFT_SF_DIR`. Optimization rounds commit these as the
  * before/after plan evidence (`plans/r15/`); the shared-stage
  * frames are captured too (prefix `stage_`), since most dedup-family
  * rows read through them. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Stage frames must exist before queries that read them are planned
    // the way the bench plans them (cache hits), and the stage plans
    // themselves are evidence for the stage_* rows.
    val stages = graft.queries.LlmQueries.sharedStageFrames(spark, sfDir)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (n, fn) => (n, () => fn(spark, sfDir)) }
    (stages ++ queries)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn()
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $name")
        } catch { case t: Throwable =>
          System.err.println(s"[plandump] $name failed: ${t.getMessage}")
        }
      }
    spark.stop()
  }
}
