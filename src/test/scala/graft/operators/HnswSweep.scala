package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{dot, toDouble}

/** Dev tool: the s11 recall/cost curve over the graph degree (m) and the
  * fixed beam-schedule knobs (efUpper, ef0, layer-0 hops) at a given
  * corpus scale — the measurement behind [[HnswGraph.search]]'s defaults
  * (recorded in BASELINE.md). Run with
  * `sbt "Test/runMain graft.operators.HnswSweep [sfDir|xN] [mList]
  * [efUpperList ef0List hops0List] [probeStride]"`
  * (probeStride defaults to 7 — every 7th vector probes; larger
  * strides cut brute-truth and search cost proportionally for big
  * generated corpora while keeping thousands of probes):
  * builds the graph once per m, then times each schedule and reports
  *  - recall@5 against the brute-force answer over the same probe set,
  *  - scored-nodes/query (landing + every hop expansion — THE number the
  *    sublinearity claim rests on; [[HnswGraph.SearchStats]]),
  *  - layer-0 edge recall (what fraction of each probe's brute top-5 is
  *    a direct out-edge — separates "the graph lacks the edge" from
  *    "the beam cannot find it").
  * Parallelism via SPARK_GRAFT_CPUS (default 8, matching earlier rounds'
  * recorded sweeps).
  */
object HnswSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      // the x300 NN-descent pool shuffles ~4-5e9 id-pair rows; lz4
      // spill overran this sandbox's 77 GB free twice — zstd halves
      // the shuffle bytes for ~10-20% stage CPU (r13 measured; pass
      // SPARK_GRAFT_SHUFFLE_CODEC=zstd for big-corpus sweeps)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // generated corpora arrive as 2-3 parquet splits — without a
    // repartition the brute-truth BroadcastNestedLoopJoin (parallelism
    // = streamed-side partitions) runs ~3-way on a 32-core host
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .repartition(4 * cpus.toInt)
      .persist()
    val n = e.count()
    println(s"corpus: $n vectors from $dir")

    val cells = HnswGraph.signCells(e, HnswGraph.bitsFor(n)).persist()
    val stride = HnswGraph.strideFor(n)
    val probeStride = args.lift(5).map(_.toInt).getOrElse(7)
    val qs = e.where(col("vec_id") % probeStride === 0)
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

    // SPARK_GRAFT_BUILD_SQ8=1: build with the byte-code scorer — the
    // declared rung once the raw-vector broadcast outgrows the host
    // (r13 x300: ~300 sliced-job broadcasts of the 600k×0.5 KB raw
    // table OOM'd a 64 GB driver; the sq8 codes are 8× smaller).
    // Search below still re-scores with exact vectors either way.
    val sq8 = sys.env.get("SPARK_GRAFT_BUILD_SQ8").contains("1")
    for (m <- args.lift(1).map(_.split(",").toSeq.map(_.toInt))
        .getOrElse(Seq(HnswGraph.DefaultM))) {
      val t0 = System.nanoTime()
      val adj = HnswGraph.build(e, cells, m = m, stride = stride,
        sq8 = sq8).persist()
      val edges = adj.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      // edge recall: brute top-5 pairs present as direct layer-0 edges
      val l0 = adj.where(col("layer") === 0)
        .select(col("src").as("q"), col("dst").as("nb"))
      val eHits = brute.intersect(l0).count()
      println(f"m=$m sq8=$sq8 build: $edges edges in $tBuild%.1f s " +
        f"edge_recall=${eHits.toDouble / (5.0 * nQ)}%.3f")
      def intsAt(i: Int, dflt: Seq[Int]) =
        args.lift(i).map(_.split(",").toSeq.map(_.toInt)).getOrElse(dflt)
      for {
        efUpper <- intsAt(2, Seq(4, 8))
        ef0 <- intsAt(3, Seq(32, 48))
        hops0 <- intsAt(4, Seq(3, 4, 5))
      } {
        val t1 = System.nanoTime()
        val st = new HnswGraph.SearchStats
        val ann = HnswGraph.search(adj, e, qs, efUpper = efUpper,
          ef0 = ef0, hops0 = hops0, stats = Some(st))
          .select(col("q"), col("nb"))
        val hits = ann.intersect(brute).count()
        val secs = (System.nanoTime() - t1) / 1e9
        val recall = hits.toDouble / (5.0 * nQ)
        println(f"m=$m efUpper=$efUpper ef0=$ef0%2d " +
          f"hops0=$hops0 recall@5=$recall%.3f search=$secs%.2f s " +
          f"scored/q=${st.scoredPerQuery}%.0f")
      }
      adj.unpersist()
    }
    spark.stop()
  }
}
