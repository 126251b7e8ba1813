package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev probe: the r13 FIXED-PROBE s12 measurement (the r12 verdict's
  * item 3 — the d17 precedent applied to the recall readout). s12's
  * probe set is every 7th corpus vector, so the standard scale probe
  * grows |Q| with the corpus and the brute ground-truth side pays
  * q·n = n²/7 scored pairs — the x100 exponent read 1.09 by that
  * construction, not by engine growth (the same search read 0.69 in
  * the s11 row). This probe re-times the FULL s12 computation (brute
  * top-5 ground truth + graph search + the hit join/agg) at
  * x10/x30/x100 with the probe set FROZEN at the x10 slice
  * (`vec_id % 7 = 0 AND vec_id < 20000`, |Q| = 2857): the brute side
  * becomes |Q_fixed|·n (linear) and the fitted exponent isolates what
  * the evaluation actually does as the corpus grows. Standing
  * serve_probe_x* graphs are reused (registration included), so no
  * build cost pollutes the row. Run:
  * `sbt "Test/runMain graft.operators.S12FixedProbe <out.json>
  * <m1:dir1,...>"`. */
object S12FixedProbe {

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sizes: Seq[(Long, String)] = args(1).split(",").toSeq.map { s =>
      val Array(m, dir) = s.split(":", 2)
      (m.toLong, dir)
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

    val probeCap = 20000L // the x10 slice — every probed size covers it
    val rows = sizes.map { case (mult, dir) =>
      val table = s"serve_probe_x$mult"
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
      // s12's computation with the probe slice frozen: brute exact
      // top-5 over the GROWING corpus for the FIXED |Q|, the graph
      // answer for the same queries, then the per-query hit count —
      // the identical join/agg tail as s12GraphRecall.
      def s12Frozen(): org.apache.spark.sql.DataFrame = {
        val qs = e.where(col("vec_id") % 7 === 0 &&
            col("vec_id") < probeCap)
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
          .groupBy(col("q"))
          .agg(count(lit(1)).as("k"), count(col("anb")).as("n_hit"))
      }
      s12Frozen().count() // warm
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        s12Frozen().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val recall = s12Frozen()
        .agg(sum(col("n_hit")).cast("double") / sum(col("k")))
        .head().getDouble(0)
      println(f"[s12probe] x$mult n=$n $t%.2fs recall=$recall%.3f " +
        s"(min of $runs)")
      e.unpersist()
      (mult, t, recall)
    }
    val pts = rows.map { case (m, t, _) =>
      (math.log(m.toDouble), math.log(math.max(t, 1e-3))) }
    val np = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val timesJson = rows.map { case (m, t, _) =>
      f""""x$m":$t%.3f""" }.mkString("{", ",", "}")
    val recallJson = rows.map { case (m, _, r) =>
      f""""x$m":$r%.4f""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"s12_fixed_probe","probe_cap":$probeCap,""" +
      s""""runs":$runs,"times":$timesJson,"recall":$recallJson,""" +
      f""""exponent":$slope%.2f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
