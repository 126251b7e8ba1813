package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.functions.TextFunctions.dot
import graft.operators.IvfIndex

/** The r8 streaming SOAK: the four streaming services a curation
  * deployment runs side by side — exact-dedup curation
  * (dropDuplicatesWithinWatermark), near-dup detection
  * (flatMapGroupsWithState), per-source quota (EventTimeTimeout state),
  * and ANN serving (stateless probe joins) — driven through 100+
  * micro-batches of advancing event time in ONE session, with the state
  * stores sampled per round. The claim under test is the one plan pins
  * cannot make: watermark/timeout eviction ACTUALLY bounds every state
  * store (sizes plateau instead of growing with stream length), and
  * per-round wall time stays flat — i.e. the stack can run for hours,
  * not just pass unit tests.
  */
class StreamingSoakSpec extends SparkSpec {

  private val t0 = 1700000000000L
  private def ts(ms: Long) = new Timestamp(t0 + ms)

  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null) 0L
    else p.stateOperators.toSeq.map(_.numRowsTotal).sum
  }

  /** Plateau: the late-phase peak must not meaningfully exceed the
    * mid-phase peak (steady growth would compound round over round). */
  private def assertPlateau(name: String, samples: Seq[Long]): Unit = {
    val n = samples.size
    val mid = samples.slice(n / 2, 3 * n / 4).max
    val late = samples.slice(3 * n / 4, n).max
    assert(mid > 0, s"$name: state never materialized")
    assert(late <= mid * 1.25 + 8,
      s"$name: state still growing late in the soak " +
        s"(mid peak $mid, late peak $late): ${samples.takeRight(12)}")
  }

  test("100+ micro-batch soak: curate + near-dup + quota + ANN serving " +
      "concurrently; every state store plateaus; throughput stays flat") {
    import spark.implicits._

    // replay markers + epochs survive the commits dir across JVMs — a
    // previous soak would otherwise make every segment/CDC micro-batch
    // skip as already applied. MUST run before the index/graph/corpus
    // writes below (it drops tables AND their locations).
    Seq("soak_seg_snapshot", "soak_cdc_snapshot", "soak_hnsw_graph",
      "soak_hnsw_corpus", "soak_ann_index")
      .foreach { t =>
        // vacuum BEFORE the epoch reset: it computes its cut from the
        // old run's epoch, so keepLast = 0 clears that run's history
        graft.operators.SnapshotMerge.vacuumVersions(spark, t, 0)
        graft.operators.SnapshotMerge.dropTableAndLocation(spark, t)
        graft.operators.TableCommit.reset(spark, t)
      }

    // --- ANN index + centroids (the StreamingAnnSpec corpus) ---
    val corpus = (1 to 120).map { i =>
      QueryVec(i.toLong, Array(1.0 + i % 7, 2.0 + i % 5, 1.0 + i % 3,
        (i % 11).toDouble))
    }
    val eDf = corpus.toDF().select(col("vec_id"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = eDf.where(col("vec_id") <= 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    val assigned = eDf.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    IvfIndex.write(assigned, "soak_ann_index")

    // --- HNSW graph + corpus tables for the r9 graph-ANN serving soak
    // and the r10 ingest/auto-compact soak. Built with the engine's
    // DERIVED constants (bitsFor/strideFor/mFor at the corpus size) —
    // the contract StreamingGraphAnn.ingest re-derives its append
    // parameters from.
    eDf.write.format("parquet").saveAsTable("soak_hnsw_corpus")
    val gM = graft.operators.HnswGraph.mFor(120)
    val gStride = graft.operators.HnswGraph.strideFor(120)
    val gCells = graft.operators.HnswGraph.signCells(
      eDf, graft.operators.HnswGraph.bitsFor(120))
    graft.operators.HnswGraph.writeGraph(
      graft.operators.HnswGraph.build(eDf, gCells, m = gM,
        stride = gStride),
      "soak_hnsw_graph", 120L)

    // --- the seven streams (4 from r8 + graph-ANN serving, segment
    // dedup admission, CDC time-travel apply from r9) ---
    val memCur = MemoryStream[TimedDoc](spark, 101)
    val memDup = MemoryStream[TimedDoc](spark, 102)
    val memQuo = MemoryStream[QDoc](spark, 103)
    val memAnn = MemoryStream[QueryVec](spark, 104)
    val memGra = MemoryStream[QueryVec](spark, 105)
    val memSeg = MemoryStream[TimedDoc](spark, 106)
    val memCdc = MemoryStream[CdcEvent](spark, 107)
    val memIng = MemoryStream[QueryVec](spark, 108)
    val memIvf = MemoryStream[QueryVec](spark, 109)

    // fresh unique text per (round, slot) for curation; watermark 2 min
    // on a 30 s/round clock → ~4 rounds of fingerprints live at once
    val qCur = StreamingCuration.curate(memCur.toDF(),
        watermark = "2 minutes", minQuality = 0.0)
      .writeStream.format("memory").queryName("soak_cur")
      .outputMode("append").start()
    // recycling corpus for near-dup: state stops growing once the base
    // docs are all seen (dup arrivals add no state by design)
    val qDup = StreamingCuration.curateNearDup(memDup.toDF(),
        minQuality = 0.0)
      .writeStream.format("memory").queryName("soak_dup")
      .outputMode("append").start()
    // 1-minute windows, 2-minute watermark → EventTimeTimeout evicts
    // each (source, window) counter ~3 windows after it opens
    val qQuo = StreamingQuota.admit(memQuo.toDF(), cap = 3,
        windowMs = 60000L, watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("soak_quo")
      .outputMode("append").start()
    val annSeen = new java.util.concurrent.atomic.AtomicLong(0)
    val qAnn = StreamingAnn.serve(memAnn.toDF(), cents, "soak_ann_index") {
      res => annSeen.addAndGet(res.count())
    }
    // graph-ANN serving: stateless probe descents against the standing
    // graph table, every round — over the LIVE corpus table, so results
    // keep covering vectors the ingest stream appends mid-soak
    val graSeen = new java.util.concurrent.atomic.AtomicLong(0)
    val qGra = StreamingGraphAnn.serve(
        memGra.toDF().select(col("vec_id"), col("v")),
        spark.table("soak_hnsw_corpus"), "soak_hnsw_graph") {
      res => graSeen.addAndGet(res.count())
    }
    // r10 ingest/auto-compact: delta vectors stream INTO the standing
    // graph + corpus; with maxFilesPerBucket = 3 and one file per
    // touched bucket per append, the policy must fire mid-soak and
    // rebuild-compact the graph the qGra stream is concurrently
    // serving (the drop+rename swap the serve path retries across)
    val graphCompacts = new java.util.concurrent.atomic.AtomicLong(0)
    val filesAfterCompact = new java.util.concurrent.atomic.AtomicLong(-1)
    val servedAtCompact = new java.util.concurrent.atomic.AtomicLong(-1)
    val qIng = StreamingGraphAnn.ingest(
        memIng.toDF().select(col("vec_id"), col("v")),
        "soak_hnsw_corpus", "soak_hnsw_graph",
        maxFilesPerBucket = 3, onCompact = { _ =>
      graphCompacts.incrementAndGet()
      filesAfterCompact.set(graft.operators.CompactPolicy
        .maxFilesPerBucket(spark, "soak_hnsw_graph"))
      servedAtCompact.compareAndSet(-1, graSeen.get())
    })
    // same policy over the IVF index the qAnn stream serves: list
    // compaction (ParquetCompactor in-place swap), not a rebuild
    val ivfCompacts = new java.util.concurrent.atomic.AtomicLong(0)
    val qIvf = StreamingAnn.ingest(
        memIvf.toDF().select(col("vec_id"), col("v")), cents,
        "soak_ann_index", maxFilesPerList = 3, onCompact = { rs =>
      if (rs.exists(!_.skipped)) ivfCompacts.incrementAndGet()
    })
    // segment-dedup admission over a RECYCLING corpus: once every base
    // doc has been admitted, later rounds admit nothing new — the
    // snapshot table itself must plateau, the soak's lakehouse analog
    // of a state-store plateau
    val segSeen = new java.util.concurrent.atomic.AtomicLong(0)
    val qSeg = StreamingSegmentDedup(spark, "soak_seg_snapshot",
        memSeg.toDF(), nBuckets = 4) {
      res => segSeen.addAndGet(res.count())
    }.start()
    // CDC apply with per-batch time travel: 12 recycled keys upserted
    // with advancing versions — table content bounded, epoch history
    // grows by design and is vacuumed (and spot-read) after the soak
    val qCdc = StreamingMerge.applyRetain(spark, "soak_cdc_snapshot",
      memCdc.toDF(), "k", nBuckets = 4).start()

    val rounds = 104
    val curRows = ArrayBuffer[Long]()
    val dupRows = ArrayBuffer[Long]()
    val quoRows = ArrayBuffer[Long]()
    val segRows = ArrayBuffer[Long]()
    val roundMs = ArrayBuffer[Long]()
    try {
      for (r <- 0 until rounds) {
        val w0 = System.nanoTime()
        val base = r * 30000L // event clock: 30 s per round
        memCur.addData((0 until 4).map(s => TimedDoc(r * 10L + s,
          ts(base + s * 1000), s"fresh document r$r s$s with a few " +
            s"plain words token${r % 97} token${(r + s) % 89}")))
        memDup.addData((0 until 4).map { s =>
          val k = (r * 4 + s) % 24 // 24 base docs recycled forever —
          // SAME doc_id each revisit, so the band state's seen-set
          // absorbs the re-send without growth (the re-crawl shape)
          TimedDoc(k.toLong, ts(base + s * 1000),
            s"the base document number $k holds a stable ledger of " +
              s"plain words for bucket state with token$k marker$k")
        })
        memQuo.addData((0 until 6).map(s => QDoc(s"src${s % 2}",
          r * 10L + s, ts(base + s * 500))))
        memAnn.addData(Seq(corpus((r * 7) % 120), corpus((r * 13) % 120)))
        memGra.addData(Seq(corpus((r * 11) % 120)))
        memSeg.addData((0 until 2).map { s =>
          val k = (r * 2 + s) % 24 // same 24 base docs as the dup stream
          TimedDoc(k.toLong, ts(base + s * 1000),
            s"segment soak document $k repeats sixteen stable words so " +
              s"its fingerprints recur verbatim across revisits num$k")
        })
        memCdc.addData((0 until 3).map(s => CdcEvent((r * 3 + s) % 12L,
          r.toLong, "U", s"v$r-$s")))
        if (r % 6 == 0) {
          // ingest cadence: every 6th round, two near-copies of
          // standing vectors at fresh ODD ids (never ≡ 0 mod stride →
          // always layer 0) into the graph, two fresh vectors into the
          // IVF index — 17 appends over the soak, files-per-bucket
          // crosses 3 repeatedly
          memIng.addData((0 until 2).map { s =>
            val src = corpus((r * 5 + s * 3) % 120)
            QueryVec(10001L + r * 10 + s * 2,
              src.v.updated(0, src.v(0) + 1e-4 * (r + 1)))
          })
          memIvf.addData((0 until 2).map { s =>
            val src = corpus((r * 7 + s * 5) % 120)
            QueryVec(20001L + r * 10 + s,
              src.v.updated(1, src.v(1) + 1e-4 * (r + 1)))
          })
        }
        qCur.processAllAvailable()
        qDup.processAllAvailable()
        qQuo.processAllAvailable()
        qAnn.processAllAvailable()
        qGra.processAllAvailable()
        qSeg.processAllAvailable()
        qCdc.processAllAvailable()
        qIng.processAllAvailable()
        qIvf.processAllAvailable()
        curRows += stateRows(qCur)
        dupRows += stateRows(qDup)
        quoRows += stateRows(qQuo)
        segRows += spark.table("soak_seg_snapshot").count()
        roundMs += (System.nanoTime() - w0) / 1000000L
      }

      // every query really ran ≥100 micro-batches
      assert(qCur.lastProgress.batchId >= 100)
      assert(qDup.lastProgress.batchId >= 100)
      assert(qQuo.lastProgress.batchId >= 100)
      assert(qGra.lastProgress.batchId >= 100)
      assert(qSeg.lastProgress.batchId >= 100)
      assert(qCdc.lastProgress.batchId >= 100)
      assert(qIng.lastProgress.batchId >= 10)
      assert(qIvf.lastProgress.batchId >= 10)
      assert(annSeen.get() > 0)
      assert(graSeen.get() > 0)
      assert(segSeen.get() > 0)

      // --- r10 auto-compact policy: the threshold was crossed and
      // compaction fired MID-STREAM, on both standing indexes, while
      // their serving streams kept answering ---
      assert(graphCompacts.get() >= 1,
        "graph auto-compact never fired: files-per-bucket policy dead")
      assert(ivfCompacts.get() >= 1,
        "IVF auto-compact never fired: files-per-list policy dead")
      assert(filesAfterCompact.get() === 1,
        s"compact must restore one file per bucket, " +
          s"saw ${filesAfterCompact.get()}")
      // serving on BOTH sides of the swap: answers flowed before the
      // first compact and kept flowing after it
      assert(servedAtCompact.get() > 0,
        "no graph queries served before the first compact")
      assert(graSeen.get() > servedAtCompact.get(),
        "no graph queries served after the compact swap")
      // the grown corpus table holds every ingested delta
      val nIngested = (0 until rounds).count(_ % 6 == 0) * 2
      assert(spark.table("soak_hnsw_corpus").count() === 120L + nIngested)
      // findability across the swap: querying AT an ingested delta's
      // source vector surfaces the delta on the compacted graph
      val lastIngRound = (0 until rounds).filter(_ % 6 == 0).max
      val probeSrc = corpus((lastIngRound * 5) % 120)
      val probe = Seq((probeSrc.vec_id, probeSrc.v))
        .toDF("q", "qv")
        .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      val found = graft.operators.HnswGraph.search(
          spark.table("soak_hnsw_graph"),
          spark.table("soak_hnsw_corpus"), probe)
        .select(col("nb")).as[Long].collect().toSet
      assert(found.contains(10001L + lastIngRound * 10),
        s"ingested near-copy of ${probeSrc.vec_id} not findable: $found")
      assert(spark.table("soak_cur").count() > 0)
      assert(spark.table("soak_quo").count() > 0)

      assertPlateau("curate", curRows.toSeq)
      assertPlateau("nearDup", dupRows.toSeq)
      assertPlateau("quota", quoRows.toSeq)
      // the segment snapshot is the plateau's LAKEHOUSE form: recycled
      // docs admit nothing new once all 24 are seen
      assertPlateau("segmentSnapshot", segRows.toSeq)

      // CDC epoch history: the soak retained ~one epoch per round;
      // bounded retention vacuums all but the newest 3, and the live
      // table still holds exactly the 12 recycled keys
      val dropped = graft.operators.SnapshotMerge.vacuumVersions(
        spark, "soak_cdc_snapshot", 3)
      assert(dropped.size >= 90, s"expected ~100 vacuumed epochs, " +
        s"got ${dropped.size}")
      assert(spark.table("soak_cdc_snapshot").count() === 12)
      val cur = graft.operators.TableCommit.epochOf(
        spark, "soak_cdc_snapshot")
      assert(graft.operators.SnapshotMerge.readAt(
        spark, "soak_cdc_snapshot", cur - 1).count() === 12)

      // throughput flat: the late-quarter median round must stay within
      // 3× the early-quarter median (generous for shared-host noise —
      // state GROWTH would show up as a steady slope, not noise)
      val sorted = (s: Seq[Long]) => s.sorted.apply(s.size / 2)
      val early = sorted(roundMs.slice(rounds / 8, rounds / 4).toSeq)
      val late = sorted(roundMs.takeRight(rounds / 4).toSeq)
      assert(late <= early * 3 + 50,
        s"round time grew: early median ${early}ms late median ${late}ms")
    } finally {
      qCur.stop(); qDup.stop(); qQuo.stop(); qAnn.stop()
      qGra.stop(); qSeg.stop(); qCdc.stop(); qIng.stop(); qIvf.stop()
      Seq("soak_ann_index", "soak_hnsw_graph", "soak_hnsw_corpus",
        "soak_seg_snapshot", "soak_cdc_snapshot")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }
}
