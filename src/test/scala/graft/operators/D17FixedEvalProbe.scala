package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev probe: the r12 FIXED-EVAL d17 measurement (the r11 verdict's
  * item 4). d17's eval set is a corpus split (vec_id ≡ 0 mod 17), so
  * the standard scale probe grows the PROBE SET with the corpus and
  * the x100 exponent reads 1.15 by construction (q·n pair volume at a
  * fixed cell count — probe geometry, not engine growth). This probe
  * re-times d17 at x10/x30/x100 with the eval side FROZEN at the x10
  * slice (`vec_id < 20000` — [[graft.queries.LlmQueries.d17FrozenEval]]),
  * so the fitted exponent isolates what the ENGINE does as the corpus
  * grows: broadcast centroid assignment + the cell equi-join, expected
  * ≤ ~1. Run with `sbt "Test/runMain graft.operators.D17FixedEvalProbe
  * <out.json> <m1:dir1,...>"`. */
object D17FixedEvalProbe {

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
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val evalCap = 20000L // the x10 slice — every probed size covers it
    val rows = sizes.map { case (m, dir) =>
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.LlmQueries.d17FrozenEval(spark, dir, evalCap)
          .count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[d17probe] x$m%.0f $t%.2fs (min of $runs)")
      (m, t)
    }
    // least-squares slope of log t on log m
    val pts = rows.map { case (m, t) =>
      (math.log(m), math.log(math.max(t, 1e-3))) }
    val np = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val timesJson = rows.map { case (m, t) =>
      f""""x${m.toLong}":$t%.3f""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"d17_fixed_eval","eval_cap":$evalCap,"runs":$runs,""" +
      f""""times":$timesJson,"exponent":$slope%.2f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
