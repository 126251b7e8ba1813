package graft

import org.apache.spark.sql.SparkSession

/** The r8 SCALING PROBE: time the heavy query families on a series of
  * corpus sizes ([[ScaleData]] multipliers of the sf0.1 row counts) and
  * report per-(size, query) wall seconds plus the fitted scaling
  * exponent, so the 100 TB story rests on MEASURED growth, not only on
  * plan pins.
  *
  * Exponent: least-squares slope of log t vs log m over the measured
  * sizes. ~1.0 = linear (the scale-safe shape), ~2.0 = quadratic (the
  * declared brute-force accuracy tiers — d02 is EXPECTED to show this,
  * that is why d03's LSH tier exists). Each (size, query) is timed
  * `runs` times and the MINIMUM is kept: host-contention spikes stretch
  * individual runs and a min-of-3 is the standard noise floor for a
  * scaling fit (the calib block records what the host gave the probe).
  *
  * Shared stages are timed as their own rows first (same attribution
  * discipline as [[Bench]]); per-query times then measure each query's
  * OWN work on a warm stage cache at every size.
  *
  * Usage: `runMain graft.ScaleProbe <out.json> <m1:dir1,m2:dir2,...>`
  * (m = row-count multiple of sf0.1; dir = corpus directory).
  */
object ScaleProbe {

  /** The heavy families named by the r7 verdict plus the late-r8
    * additions (d14/d15/d16/d17/l03/s11), in sweep order. Overridable
    * via SPARK_GRAFT_PROBE_QUERIES (comma-separated) for a targeted
    * probe of a subset. */
  val Heavy: Seq[String] =
    sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq(
        "d02_dedup_ngram_jaccard", "d03_dedup_minhash_lsh",
        "d08_dup_clusters", "d11_incremental_dedup", "d12_substring_spans",
        "d13_source_overlap", "d14_max_dup_segments", "d15_paragraph_dedup",
        "d16_cluster_keep_best", "d17_semantic_decontaminate",
        "s03_ann_ivf_topk", "s04_ann_ivfpq_topk", "s10_ann_indexed",
        "s11_ann_hnsw", "l02_snapshot_merge", "l03_time_travel",
        "p05_curriculum"))

  private def calibrate1(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0L
    while (i < 100000000L) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
    }
    require(x != 42)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sizes: Seq[(Double, String)] = args(1).split(",").toSeq.map { s =>
      val Array(m, dir) = s.split(":", 2)
      (m.toDouble, dir)
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warmup

    val qs = SparkEntry.queries
    val calib0 = calibrate1()
    // rows: (m, name, secs)
    // SPARK_GRAFT_PROBE_STAGES: comma-separated stage-name filter for a
    // targeted probe (e.g. the dedup families don't need the x100 graph
    // build's minutes); unset = all stages, the full-sweep default
    val stageFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_PROBE_STAGES")
        .map(_.split(",").toSet.map((s: String) => s.trim))
    val rows = sizes.flatMap { case (m, dir) =>
      // cold stage cache per size, then stages timed as their own rows
      graft.queries.LlmQueries.clearStageCache()
      val stageRows = graft.queries.LlmQueries.sharedStages(spark, dir)
        .filter { case (name, _) => stageFilter.forall(_.contains(name)) }
        .map { case (name, force) =>
          val t0 = System.nanoTime()
          force()
          val t = (System.nanoTime() - t0) / 1e9
          println(s"[probe] m=$m $name ${f"$t%.2f"}s")
          (m, name, t)
        }
      val queryRows = Heavy.map { name =>
        val fn = qs(name)
        val t = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(s"[probe] m=$m $name ${f"$t%.2f"}s (min of $runs)")
        (m, name, t)
      }
      stageRows ++ queryRows
    }
    val calib1 = calibrate1()

    // least-squares slope of log t on log m per query name
    val exps = rows.groupBy(_._2).map { case (name, rs) =>
      val pts = rs.map { case (m, _, t) =>
        (math.log(m), math.log(math.max(t, 1e-3))) }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (name, slope)
    }

    val timesJson = sizes.map { case (m, _) =>
      val inner = rows.filter(_._1 == m)
        .map { case (_, k, t) => "\"" + k + "\":" + f"$t%.3f" }
        .mkString("{", ",", "}")
      "\"x" + (if (m == m.floor) m.toLong.toString else m.toString) +
        "\":" + inner
    }.mkString("{", ",", "}")
    val expJson = exps.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"scaling","runs":$runs,"times":$timesJson,""" +
      s""""exponents":$expJson,""" +
      s""""calib":{"t1_start_sec":$calib0,"t1_end_sec":$calib1}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
