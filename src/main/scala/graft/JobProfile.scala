package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Empirical per-job breakdown of one bench row (guide §1.1):
  * `runMain graft.JobProfile <name> [reps]` forces the named query or
  * shared stage (prefix `stage_`) over `$SPARK_GRAFT_SF_DIR` exactly the
  * way Bench does (`.count()` on a session warmed the same way), with a
  * listener recording every Spark job's wall time, stage count, task
  * count and name — the "which of the 20 jobs inside this 20-second row
  * costs what" attribution the UI would give, printable in a sandbox
  * with the UI off. Dev/measurement tool only — never on a timed path. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-jobprofile-$name")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench-identical warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "lineitem").count()

    case class Job(id: Int, desc: String, start: Long) {
      var end: Long = 0L
      var stages: Int = 0
      var tasks: Int = 0
    }
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId,
            Option(e.properties.getProperty("spark.job.description"))
              .getOrElse(""), e.time)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          jobs.values.lastOption.foreach { j =>
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
          }
        }
    }

    val stageForce: Map[String, () => Long] =
      graft.queries.LlmQueries.sharedStages(spark, sfDir).toMap
    // mirror Bench: query rows time against WARM shared stages
    if (!name.startsWith("stage_"))
      graft.queries.LlmQueries.sharedStages(spark, sfDir)
        .foreach { case (_, f) => f() }
    def force(): Long =
      if (name.startsWith("stage_")) {
        // a profiled stage must REBUILD per rep (drop the session cache)
        graft.queries.LlmQueries.dropStage(spark, sfDir,
          name.stripPrefix("stage_"))
        stageForce(name)()
      } else SparkEntry.queries(name)(spark, sfDir).count()

    // non-shared cache keys a rep must rebuild (e.g. `hnsw_ann` when
    // profiling s11): SPARK_GRAFT_PROFILE_DROP=key1,key2
    val dropPerRep = sys.env.get("SPARK_GRAFT_PROFILE_DROP")
      .map(_.split(",").toSeq).getOrElse(Nil)

    for (r <- 1 to reps) {
      dropPerRep.foreach(k =>
        graft.queries.LlmQueries.dropStage(spark, sfDir, k))
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = force()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener events are posted async — drain before reading
      Thread.sleep(300)
      val snapshot = jobs.synchronized(jobs.values.toSeq)
      println(f"[jobprofile] $name rep $r: $n rows in $secs%.3f s, " +
        s"${snapshot.size} jobs")
      snapshot.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else Double.NaN
        println(f"[jobprofile]   job ${j.id}%3d ${dur}%8.3f s  " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
      }
      val gaps = snapshot.sliding(2).collect {
        case Seq(a, b) if b.start > a.end => (b.start - a.end) / 1e3
      }.toSeq
      if (snapshot.nonEmpty) {
        val jsum = snapshot.map(j => (j.end - j.start) / 1e3).sum
        println(f"[jobprofile]   sum(job)=${jsum}%.3f s  " +
          f"inter-job gap=${gaps.sum}%.3f s  (driver/planning time)")
      }
    }
    spark.stop()
  }
}
