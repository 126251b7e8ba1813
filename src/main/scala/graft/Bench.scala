package graft

import org.apache.spark.sql.SparkSession

import graft.epic.{EpicPipeline, ImageFixtures}

/** Driver-run benchmark: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR, plus EPIC streaming-pipeline throughput on
  * reference-shaped cubes (22 chan × 2 pol × 64², ~1.4 MB float32 — the
  * shape behind BASELINE.md's derived ~10.4 images/s/instance). Prints one
  * JSON line.
  *
  * The JSON carries a host-contention calibration ("calib"): a fixed pure
  * -JVM integer workload timed single-threaded and on all N cores, at
  * bench start and again just before the ingest runs. Identical code has
  * measured 5–72 images/s median across driver rounds purely from host
  * state (the r3 host ran the whole sbt invocation 3.5× slower than r4's);
  * the calibration pins what the host actually gave each run, so a low
  * ingest number can be read against it instead of guessed about. */
object Bench {

  /** Wall seconds for `threads` concurrent copies of a fixed xorshift64
    * loop. Perfect scaling ⇒ same wall time as threads=1; a contended or
    * throttled host stretches it proportionally. */
  private def calibrate(threads: Int): Double = {
    val iters = 100000000L
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + t
        var i = 0L
        while (i < iters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        sink.addAndGet(x)
      })
      th.start(); th
    }
    ts.foreach(_.join())
    require(sink.get() != 42) // keep the loops alive
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session/codegen warmup so the first timed query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "lineitem").count()

    // host-state probe before the query suite (untimed JIT warm-up first)
    calibrate(1)
    val calibStart1 = calibrate(1)
    val calibStartN = calibrate(cpus.toInt)

    // Shared-stage builds timed as their OWN rows, before the sweep:
    // the dedup/LM/DSIR families share session-cached stages, and when
    // the first consuming query paid the build, its seconds wandered
    // with sweep order (r7's d13/l02/s08 weak calls). Stage seconds are
    // part of "value" (the sweep really pays them) but attributed here,
    // not to an arbitrary query.
    val stageRows = graft.queries.LlmQueries.sharedStages(spark, sfDir)
      .map { case (name, force) =>
        val t0 = System.nanoTime()
        val ok =
          try { force(); true }
          catch { case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }

    // (name, seconds, ok): a query that throws is recorded as ok=false so
    // a crash can never read as a fast run — the failure is visible in the
    // JSON ("errors" list + per-query flag) and total excludes it.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    // OUTLIER RE-RUN: any row whose reading exceeds 2× the hi edge of its
    // recorded clean-host band (bands.json, written from 3 clean runs) is
    // re-timed once at sweep end with a fresh single-thread calibration
    // sample on each side. Both readings are emitted — a transient host
    // spike shows as rerun ≪ first (with the recalib pinning what the
    // host gave), a real regression shows as rerun ≈ first — so a spiky
    // driver host can no longer produce an unadjudicable weak call.
    val bands: Map[String, (Double, Double)] = {
      val f = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_BANDS", "bands.json"))
      if (!f.exists()) Map.empty
      else try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(f).asInstanceOf[JObject].obj.collect {
          case (name, JArray(List(lo, hi))) =>
            name -> (lo.values.toString.toDouble,
              hi.values.toString.toDouble)
        }.toMap
      } catch { case t: Throwable =>
        System.err.println(s"[bench] bands.json unreadable: ${t.getMessage}")
        Map.empty
      }
    }
    val reruns: Seq[(String, Double, Double, Double, Double)] =
      results.filter { case (name, secs, ok) =>
        ok && bands.get(name).exists { case (_, hi) => secs > 2 * hi }
      }.map { case (name, first, _) =>
        val c0 = calibrate(1)
        val t0 = System.nanoTime()
        // same guard as the timed loop: the rerun fires under exactly the
        // host stress that produced the outlier, and an uncaught throw here
        // would abort main before the JSON line — losing the whole sweep.
        // A failed rerun records NaN (valid JSON via the literal below).
        val again =
          try { SparkEntry.queries(name)(spark, sfDir).count();
            (System.nanoTime() - t0) / 1e9 }
          catch { case t: Throwable =>
            System.err.println(s"[bench] rerun $name FAILED: ${t.getMessage}")
            Double.NaN
          }
        val c1 = calibrate(1)
        System.err.println(f"[bench] outlier re-run $name: first=$first%.2f" +
          f" rerun=$again%.2f (calib $c0%.2f/$c1%.2f)")
        (name, first, again, c0, c1)
      }

    // STAGE outlier re-run — same adjudication for the shared-stage rows
    // (the r14 driver run read stage_lsh_pairs at 2.9× its band with the
    // mechanism blind to stages, leaving d03 weak-by-default). Re-timing a
    // stage means dropping ONLY its cache entry and re-forcing: upstream
    // stages stay warm, so the rerun measures the same work the original
    // row did (stages are forced in dependency order). The rebuilt frame
    // re-enters the cache; clearStageCache below releases it as before.
    val stageReruns: Seq[(String, Double, Double, Double, Double)] = {
      val force = graft.queries.LlmQueries.sharedStages(spark, sfDir).toMap
      stageRows.filter { case (name, secs, ok) =>
        ok && bands.get(name).exists { case (_, hi) => secs > 2 * hi }
      }.map { case (name, first, _) =>
        val c0 = calibrate(1)
        graft.queries.LlmQueries.dropStage(spark, sfDir,
          name.stripPrefix("stage_"))
        val t0 = System.nanoTime()
        val again =
          try { force(name)(); (System.nanoTime() - t0) / 1e9 }
          catch { case t: Throwable =>
            System.err.println(s"[bench] rerun $name FAILED: ${t.getMessage}")
            Double.NaN
          }
        val c1 = calibrate(1)
        System.err.println(f"[bench] outlier re-run $name: first=$first%.2f" +
          f" rerun=$again%.2f (calib $c0%.2f/$c1%.2f)")
        (name, first, again, c0, c1)
      }
    }

    // optional untimed metrics pass: per-query shuffle/spill volumes from
    // the operator SQLMetrics (SPARK_GRAFT_BENCH_METRICS=1). Separate
    // from the timed loop so the timing methodology stays comparable
    // across rounds.
    val volumes: Option[Seq[(String, Long, Long)]] =
      if (!sys.env.get("SPARK_GRAFT_BENCH_METRICS").contains("1")) None
      else Some(SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            val c = graft.operators.QueryMetrics.measure(fn(spark, sfDir))
            Seq((name, c.shuffleBytesWritten, c.spillBytes))
          } catch { case _: Throwable => Nil }
      })

    // the dedup family's shared stages are done serving queries — release
    // their persisted blocks so the ingest phase gets the full executor
    // memory (and the smaller RSS it implies)
    graft.queries.LlmQueries.clearStageCache()

    // EPIC ingest throughput: one micro-batch of reference-shaped cubes
    // (22 chan ≈ 1.4 MB float32 each) parquet→pipeline→dual parquet sink,
    // i.e. exactly what EpicStreaming.processBatch does per trigger.
    val nImages = 256
    val dts = (0 until nImages).map(i =>
      f"2022-08-31T23:29:${10 + i % 40}%02d.${i}%06d")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    // binary-blob cube layout: parquet reads one blob per image instead of
    // assembling 360k array elements (see EpicPipeline.imageBinarySchema)
    ImageFixtures.imagesBinaryDf(spark, dts, nChan = 22,
      numPartitions = cpus.toInt).write.parquet(s"$tmp/images")
    val images = spark.read.parquet(s"$tmp/images")
    val watch = ImageFixtures.watchlistDf(spark)
    // untimed warm-up batches: pay one-time codegen/JIT/page-cache costs
    // like the first micro-batches of a streaming query; steady state is
    // what we rate (a streaming service runs this pipeline every trigger
    // for hours). Two warm-ups, because measured run-to-run spread showed
    // the first timed batch still absorbing JIT. Then 5 timed batches —
    // the median is the headline, the spread is reported alongside (5 not
    // 3: host-contention spikes hit single batches, and a median of 5 is
    // robust to two bad batches where a median of 3 flips on one).
    for (w <- 1 to 2) {
      val (wpx, wmeta) = EpicPipeline.pixelsAndMeta(images, watch)
      wpx.write.parquet(s"$tmp/warm_px_$w")
      wmeta.write.parquet(s"$tmp/warm_meta_$w")
    }
    // host-state probe again: contention at ingest time is what matters
    // for the ingest number, and it can differ from bench start
    val calibIngest1 = calibrate(1)
    val calibIngestN = calibrate(cpus.toInt)
    val timedBatches = (1 to 5).map { r =>
      val t0 = System.nanoTime()
      val (px, meta) = EpicPipeline.pixelsAndMeta(images, watch)
      px.write.parquet(s"$tmp/epic_pixels_$r")
      meta.write.parquet(s"$tmp/epic_img_metadata_$r")
      val rate = nImages / ((System.nanoTime() - t0) / 1e9)
      // per-batch host attribution: two bracketing calib points can't
      // timestamp WHICH batches an interference window hit (r9 saw
      // 12.9–90.5 img/s inside one run against clean-looking brackets);
      // a 1-thread probe right after each timed batch pins what the
      // host was giving at that batch, the way query rows carry their
      // re-run evidence
      (rate, calibrate(1))
    }
    val runs = timedBatches.map(_._1)
    val imagesPerSec = runs.sorted.apply(runs.size / 2)
    val imagesPerSecMax = runs.max
    val nPx = spark.read.parquet(s"$tmp/epic_pixels_1").count()
    require(nPx > 0 &&
      spark.read.parquet(s"$tmp/epic_img_metadata_1").count() == nImages)

    // "queries" stays flat name→sec (the driver-contract shape);
    // per-query success lands in "queries_ok" + the "errors" list.
    // Seconds are rounded to ms: the full-precision doubles made the
    // one JSON line ~8 KB, and the driver keeps only a ~4 KB tail of
    // the sbt output — every round through r10 read "parsed": null and
    // fell back to regex. ms precision is far inside the run-to-run
    // band (±0.1+ s on every row), so nothing adjudicable is lost.
    def ms(v: Double): String =
      if (v.isNaN) "null" else BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val errors = (stageRows ++ results).filterNot(_._3)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // total includes the stage builds — the sweep genuinely pays them —
    // so it stays comparable to pre-r8 totals where the first consuming
    // query carried each build inside its own row
    val total = (stageRows ++ results).filter(_._3).map(_._2).sum
    val stages = stageRows.map { case (k, v, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val volJson = volumes.map { vs =>
      val sh = vs.map { case (k, b, _) => "\"" + k + "\":" + b }
        .mkString("{", ",", "}")
      val sp = vs.map { case (k, _, b) => "\"" + k + "\":" + b }
        .mkString("{", ",", "}")
      s""""queries_shuffle_bytes":$sh,"queries_spill_bytes":$sp,"""
    }.getOrElse("")
    val rerunJson = (reruns ++ stageReruns).map { case (k, first, again, c0, c1) =>
      val againJson = if (again.isNaN) "null" else again.toString
      "\"" + k + "\":{\"first\":" + first + ",\"rerun\":" + againJson +
        ",\"recalib_t1\":[" + c0 + "," + c1 + "]}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""queries":$qs,""" +
      s""""stages":$stages,"queries_rerun":$rerunJson,""" +
      s""""queries_ok":$oks,"errors":$errors,$volJson""" +
      s""""images_per_sec":${ms(imagesPerSec)},""" +
      s""""images_per_sec_max":${ms(imagesPerSecMax)},""" +
      s""""images_per_sec_runs":${runs.map(ms).mkString("[", ",", "]")},""" +
      s""""ingest_batch_calib_t1":${
        timedBatches.map(b => ms(b._2)).mkString("[", ",", "]")},""" +
      s""""calib":{"threads":$cpus,"start_t1_sec":${ms(calibStart1)},""" +
      s""""start_tn_sec":${ms(calibStartN)},""" +
      s""""ingest_t1_sec":${ms(calibIngest1)},""" +
      s""""ingest_tn_sec":${ms(calibIngestN)}},""" +
      s""""pipeline_images":$nImages,""" +
      s""""pipeline_pixel_rows":$nPx,"sf":"$sfDir"}"""
    println(json)
    // also write to a file: sbt buries stdout in [info]-prefixed logs, and
    // the round gate needs machine-parseable numbers
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    // the driver keeps only a 2000-CHAR TAIL of the sbt output
    // (measured: BENCH_r11.json's "tail" is exactly 2000 chars, cut
    // mid-line), so the machine-readable line must be (a) far under
    // 2000 bytes and (b) the last thing printed — after spark.stop()
    // so no executor-shutdown logging lands behind it. The r11 line
    // inlined all 112 per-query times (~4.6 KB) and arrived
    // decapitated for the third round running; the per-query map
    // already lives whole in `out`, so the contract line carries only
    // the headline scalars (~200 bytes) and points at the file.
    // "errors" carries the r11-contract failed-name list alongside the
    // r12 _n counts (consumers of either schema read it); capped at 8
    // names so a mass failure can never push the line past the
    // require() below — the full list is always in `out`.
    val errNames = (stageRows ++ results).filterNot(_._3).map(_._1)
    val errList = (errNames.take(8).map("\"" + _ + "\"") ++
      (if (errNames.size > 8) Seq("\"...\"") else Nil))
      .mkString("[", ",", "]")
    val contract =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""queries_ok_n":${results.count(_._3)},""" +
      s""""queries_n":${results.size},""" +
      s""""stages_n":${stageRows.size},""" +
      s""""errors_n":${errNames.size},"errors":$errList,""" +
      s""""images_per_sec":${ms(imagesPerSec)},"sf":"$sfDir",""" +
      s""""detail":"$out"}"""
    require(contract.length < 1000,
      s"contract line must survive a 2000-char tail window whole, " +
        s"got ${contract.length} chars")
    println(contract)
  }
}
