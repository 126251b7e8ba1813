package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.epic.{EpicStreaming, WatchStore, WatchStoreApi}
import graft.functions.ArrayElementSum

/** User-facing engine facade — the Spark-native surface for the reference's
  * control-plane RPCs (C1/C2, server.py:54-72; uds_server.py:122-137) and
  * the ingest lifecycle. One instance per watch-store.
  *
  * C3 (`run_epic` process manager, uds_server.py:139-194) is deliberately
  * out of engine scope: launching imager processes with NUMA pinning is the
  * cluster manager's job; the engine starts where bytes reach the socket.
  */
class GraftEngine(val spark: SparkSession, val store: WatchStoreApi) {

  /** Parquet-backed store at `watchStorePath` (single-driver default);
    * pass a [[graft.epic.JdbcWatchStore]] to the primary constructor when
    * the watchlist is shared infrastructure. */
  def this(spark: SparkSession, watchStorePath: String) =
    this(spark, new WatchStore(spark, watchStorePath))

  /** C1: register a watch (validated; duplicate-guarded). Returns id. */
  def addWatch(sourceName: String, ra: String, dec: String,
      author: String = "batman", watchMode: String = "continuous",
      patchType: String = "3x3", duration: String = "7d"): Long =
    store.addWatch(sourceName, ra, dec, author = author,
      watchMode = watchMode, patchType = patchType, duration = duration)

  /** C5: register a watch straight from an IVOA VOEvent 2.0 document. */
  def addVoeventWatch(xml: String): Long = store.addVoeventWatch(xml)

  /** C2: the current active watchlist. */
  def watchlist(): DataFrame = store.watchlist()

  /** C2: fetch_watchlist RPC shape — JSON lines. */
  def watchlistJson(): Seq[String] =
    watchlist().toJSON.collect().toSeq

  /** Start streaming ingest from the epic-socket source (S1/S3 → §3.1). */
  def startSocketIngest(socketPath: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      transientHook: DataFrame => DataFrame = identity): StreamingQuery = {
    val images = spark.readStream.format("epic-socket")
      .option("path", socketPath).load()
    EpicStreaming.start(images, store, outDir, checkpointDir, trigger,
      transientHook = transientHook)
  }

  /** Post-hoc light curves — the engine-side replacement for the PG
    * `array_element_sum` aggregate over stored pixels
    * (sql_scripts/functions.sql:24-28): element-wise sums of the
    * [complex × pol × chan] vectors per source and pixel, one row per
    * (source, pixel) over a time range. */
  def lightCurves(pixelsDir: String, metaDir: String): DataFrame = {
    val pixels = spark.read.parquet(pixelsDir)
    val meta = spark.read.parquet(metaDir)
    pixels.join(meta.select(col("id"), col("img_time")), "id")
      .groupBy(col("source_names").as("source_name"),
        col("pixel_coord"))
      .agg(count(lit(1)).as("n_epochs"),
        min(col("img_time")).as("t_min"),
        max(col("img_time")).as("t_max"),
        ArrayElementSum.column(col("pixel_values")).as("summed_values"))
  }
}

/** C4: thin CLI over the facade (the reference's `epic-stream-processor
  * watch` / `start` commands, __main__.py:22-231). */
object Cli {
  /** `--in` accepts the sf dir, the documents.parquet path, or either
    * with a trailing slash (tab-completion leaves one on the
    * directory-shaped parquet) — strip the slash FIRST or the
    * documents.parquet suffix never matches. */
  private def sfDirOf(in: String): String =
    in.stripSuffix("/").stripSuffix("/documents.parquet") match {
      // a bare relative `documents.parquet` (run from inside the sf dir)
      // has no slash for the suffix strip to catch — it IS the table, so
      // the sf dir is the cwd
      case "documents.parquet" => "."
      case d => d
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args)
    if (args.headOption.exists(_ != "serve")) spark.stop()
  }

  /** The command dispatch, against a CALLER-OWNED session — what specs
    * drive (`main` would stop the suite-shared SparkContext out from
    * under every later suite; the lingering cached plans then NPE in
    * CacheManager cleanup long after the culprit ran). */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    val opts = args.drop(1).sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }
      .toMap
    val engine = new GraftEngine(spark,
      opts.getOrElse("watch-store", "/tmp/graft_watchstore"))
    args.headOption match {
      case Some("watch") =>
        val id = engine.addWatch(
          opts("name"), opts("ra"), opts("dec"),
          author = opts.getOrElse("author", "batman"),
          watchMode = opts.getOrElse("mode", "continuous"),
          patchType = opts.getOrElse("patch", "3x3"),
          duration = opts.getOrElse("duration", "7d"))
        println(s"added watch id=$id")
      case Some("watch-voevent") =>
        val xml = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(opts("file"))), "UTF-8")
        println(s"added watch id=${engine.addVoeventWatch(xml)}")
      case Some("watchlist") =>
        engine.watchlistJson().foreach(println)
      case Some("serve") =>
        val q = engine.startSocketIngest(
          opts.getOrElse("socket", "/tmp/epic_image.sock"),
          opts.getOrElse("out", "/tmp/graft_out"),
          opts.getOrElse("checkpoint", "/tmp/graft_ckpt"))
        println(s"ingest started on ${opts.getOrElse("socket",
          "/tmp/epic_image.sock")}; ctrl-c to stop")
        q.awaitTermination()
      case Some("curate") =>
        // batch curation over a documents parquet dir: the full p01
        // pipeline (language vote → quality floor → exact dedup →
        // MinHash-LSH near-dup removal), written as parquet; with
        // --shards N the output is a TrainingExport instead — content-
        // keyed sorted shard dirs plus the verifiable checksum manifest
        val in = opts("in")
        val out = opts("out")
        val sfDir = sfDirOf(in)
        val kept = graft.queries.LlmQueries.all("p01_curation_pipeline")(
          spark, sfDir)
        // p01 returns only (doc_id, n_tokens, quality) — the oracle's
        // shape. A curated CORPUS must carry the documents themselves, so
        // join the surviving ids back to the source table for the payload
        // columns before writing/exporting.
        val result = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"), col("lang"), col("source"))
          .join(kept, Seq("doc_id"))
        opts.get("shards") match {
          case Some(n) =>
            graft.operators.TrainingExport.export(
              result, key = "doc_id", outDir = out, nShards = n.toInt)
            val ok = graft.operators.TrainingExport.verify(spark, out, "doc_id")
            println(s"exported ${spark.read.parquet(out).count()} docs " +
              s"-> $out in $n shards (manifest verify: $ok)")
          case None =>
            result.write.mode("overwrite").parquet(out)
            println(s"curated ${spark.read.parquet(out).count()} docs -> $out")
        }
      case Some("train-bpe") =>
        // BPE vocabulary training over a documents parquet dir, written
        // in the published merges.txt format (one "left right" pair per
        // line, rank = line order), directly loadable back via the
        // tokenize command. Default: t18's exact 8-round sequential
        // trainer. With --n-merges (and optionally --batch), the
        // BpeTrainer batched path — the vocab-scale form that learns
        // `batch` non-interacting merges per Spark round.
        val sfDir = sfDirOf(opts("in"))
        val out = opts.getOrElse("out", "merges.txt")
        val lines: Seq[String] = opts.get("n-merges") match {
          case Some(n) =>
            val merges = graft.operators.BpeTrainer.train(
              Tables.load(spark, sfDir, "documents"), n.toInt,
              opts.getOrElse("batch", "256").toInt)
            merges.map(m => s"${m.lhs} ${m.rhs}")
          case None =>
            val merges = graft.queries.LlmQueries.all("t18_bpe_train")(
              spark, sfDir).collect()
            merges.foreach(r => println(s"${r.getInt(0)}: " +
              s"${r.getString(1)} + ${r.getString(2)} -> " +
              s"${r.getString(3)} (${r.getLong(4)} occ)"))
            merges.toSeq.map(r => s"${r.getString(1)} ${r.getString(2)}")
        }
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        println(s"wrote ${lines.length} merges -> $out")
      case Some("tokenize") =>
        // closes the train-bpe → tokenize loop: count exact BPE tokens
        // for a documents parquet dir under a merges.txt vocabulary
        // (e.g. one train-bpe just wrote, or any published table) via
        // the vocab-size-independent BpeCount expression; writes
        // (doc_id, n_bpe) parquet and prints corpus totals
        val sfDir = sfDirOf(opts("in"))
        val codec = new graft.functions.BpeCodec(
          graft.functions.BpeVocab.load(opts("merges")))
        val counts = Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"),
            graft.plans.BpeCount(col("text"), codec).as("n_bpe"))
        opts.get("out").foreach(o =>
          counts.write.mode("overwrite").parquet(o))
        val agg = counts.agg(count(lit(1)), sum(col("n_bpe"))).head()
        println(s"tokenized ${agg.getLong(0)} docs: " +
          s"${agg.getLong(1)} tokens under ${codec.merges.length} merges" +
          opts.get("out").map(o => s" -> $o").getOrElse(""))
      case Some("table-history") =>
        // epoch history of a commit-protocol snapshot table: the live
        // epoch plus every retained version still on disk. Reads the
        // WAREHOUSE directly (a fresh JVM's in-memory catalog has
        // forgotten the tables; the directories and the epoch file are
        // the durable truth)
        val t = opts("table").toLowerCase
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val current = graft.operators.TableCommit.epochOf(spark, t)
        println(s"table $t: current epoch $current")
        val versions = (if (fs.exists(wh)) fs.listStatus(wh).toSeq
          else Nil)
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith(s"${t}__v"))
          .sortBy(_.getPath.getName)
        versions.foreach { s =>
          val e = s.getPath.getName.stripPrefix(s"${t}__v")
          val bytes = fs.getContentSummary(s.getPath).getLength
          println(s"  retained epoch $e: ${s.getPath} ($bytes bytes)")
        }
        if (versions.isEmpty) println("  (no retained versions)")
      case Some("table-read") =>
        // read a snapshot table AS OF an epoch (default: live) straight
        // from its warehouse location — works from a fresh JVM; prints
        // count + schema, and with --out copies the rows to parquet
        val t = opts("table").toLowerCase
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val current = graft.operators.TableCommit.epochOf(spark, t)
        val epoch = opts.get("epoch").map(_.toLong).getOrElse(current)
        val dir = if (epoch == current) s"$wh/$t" else s"$wh/${t}__v$epoch"
        val df = spark.read.parquet(dir)
        println(s"$t as of epoch $epoch (current $current): " +
          s"${df.count()} rows, schema ${df.schema.simpleString}")
        opts.get("out").foreach { o =>
          df.write.mode("overwrite").parquet(o)
          println(s"copied -> $o")
        }
      case Some("table-compact") =>
        // rebuild-compact a standing graph-ANN table from its corpus
        // (the periodic maintenance HnswGraph.append's scaladoc names:
        // restores one file per bucket, re-prunes every degree to 2M,
        // globally re-ranks — and re-links old nodes toward appended
        // regions). The corpus is the embeddings table of --in; the
        // derivation (bitsFor/strideFor/mFor) mirrors the s11 query
        // so the compacted table serves the same searches.
        val sfDir = sfDirOf(opts("in"))
        val t = opts.getOrElse("table", "s11_hnsw_graph").toLowerCase
        // --max-files N: compact ONLY when the CompactPolicy threshold
        // is exceeded (more than N files in some bucket) — the
        // scriptable form of the streaming ingest paths' auto-compact,
        // for cron-style maintenance of a standing table
        val needed = opts.get("max-files").forall { mf =>
          // a typo'd flag value is a usage error, not a stack trace
          val limit = scala.util.Try(mf.toInt).getOrElse {
            System.err.println(
              s"table-compact: --max-files must be an integer (got '$mf')")
            sys.exit(2)
          }
          val have = graft.operators.CompactPolicy
            .maxFilesPerBucket(spark, t)
          val over = have > limit
          println(if (over)
            s"$t exceeds policy ($have > $limit files/bucket)"
          else s"$t within policy ($have <= $limit files/bucket); " +
            "nothing to do")
          over
        }
        if (needed) {
        val e = Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"),
            graft.functions.TextFunctions.toDouble(col("embedding"))
              .as("v"))
          .withColumn("nrm",
            sqrt(graft.functions.TextFunctions.dot(col("v"), col("v"))))
        val n = e.count()
        val cells = graft.operators.HnswGraph.signCells(
          e, graft.operators.HnswGraph.bitsFor(n))
        val epoch = graft.operators.HnswGraph.compact(t, e, cells,
          m = graft.operators.HnswGraph.mFor(n),
          stride = graft.operators.HnswGraph.strideFor(n), n = n)
        // a graph with standing membership satellites must have them
        // rebuilt from the SAME corpus + cells as the rebuilt graph
        // (bitsFor/strideFor/ptFor may have stepped across the compact)
        // — otherwise later appendWithMembership batches link with
        // stale cells/stride: silent quality degradation, not a loud
        // error. Mirrors StreamingGraphAnn.ingest's compact path.
        if (spark.catalog.tableExists(
            graft.operators.HnswGraph.membTable(t)))
          graft.operators.HnswGraph.writeMembership(e, cells, t, n)
        println(s"compacted $t from $n vectors -> epoch $epoch " +
          s"(${spark.table(t).count()} edges)")
        }
      case Some("table-vacuum") =>
        // bound a table's retained history to the newest --keep versions
        val t = opts("table").toLowerCase
        // vacuumVersions resolves retained history from the warehouse
        // DISK listing itself, so this works from a fresh JVM too
        val dropped = graft.operators.SnapshotMerge.vacuumVersions(
          spark, t, opts.getOrElse("keep", "2").toInt)
        println(s"vacuumed epochs: ${
          if (dropped.isEmpty) "(none)" else dropped.sorted.mkString(", ")}")
      case Some("profile") =>
        // the t16 one-pass data-quality report over a documents parquet
        // dir: per column, rows / nulls / KMV distinct estimate
        val sfDir = sfDirOf(opts("in"))
        graft.queries.LlmQueries.all("t16_table_profile")(spark, sfDir)
          .collect()
          .foreach(r => println(s"${r.getString(0)}: rows=${r.getLong(1)} " +
            s"nulls=${r.getLong(2)} distinct_est=${r.getDouble(3)}"))
      case other =>
        System.err.println(
          s"""usage: graft.Cli <command> [--opt value ...]
             |  watch     --name N --ra R --dec D [--mode continuous|timed]
             |            [--patch 3x3|5] [--duration 7d] [--author A]
             |  watch-voevent --file VOEVENT_XML
             |  watchlist
             |  serve     [--socket PATH] [--out DIR] [--checkpoint DIR]
             |  curate    --in SF_DIR --out PARQUET_DIR [--shards N]
             |  profile   --in SF_DIR
             |  train-bpe --in SF_DIR [--out MERGES_TXT]
             |            [--n-merges N --batch B]   (batched scale path)
             |  tokenize  --in SF_DIR --merges MERGES_TXT [--out PARQUET]
             |  table-history --table T
             |  table-read    --table T [--epoch E] [--out PARQUET]
             |  table-vacuum  --table T [--keep N]
             |  table-compact --in SF_DIR [--table T] [--max-files N]
             |            (--max-files: only when some bucket exceeds N)
             |(got: ${other.getOrElse("nothing")})""".stripMargin)
        if (other.isDefined) sys.exit(2)
    }
  }
}
