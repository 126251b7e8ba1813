package graft.epic

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CoordParse

/** Watchlist state machine — the engine-side replacement for the reference's
  * `epic_watchdog` PostgreSQL table + WatchDog service
  * (epic_services/watch_dog.py:52-219, epic_orm/pg_pixel_storage.py:56-74).
  *
  * State lives in a parquet table (swap for JDBC in production — the API is
  * the same). Mutations are read→transform→atomic-rename writes; the store
  * is a driver-side control-plane object, deliberately NOT a distributed
  * dataset: the watchlist is small (it broadcasts into the hot path).
  *
  * Reference bugs intentionally fixed (SURVEY §7.3):
  *  - required-parameter validation actually validates (server.py:59-62's
  *    `par not in req_pars` no-op);
  *  - continuous mode always forces t_end = t_start + 99·365.25 d
  *    (watch_dog.py:63-64 only did so when the caller supplied t_end);
  *  - duplicate-watch guard raises on an existing *watching* source
  *    (watch_dog.py:160-168).
  */
/** Backend-independent watchlist API + the semantics every backend shares
  * (validation, coordinate/duration parsing, VOEvent intake, the active-
  * watchlist projection). Backends supply storage and their own atomicity:
  * [[WatchStore]] (parquet snapshots + JVM lock) for single-driver
  * deployments, [[JdbcWatchStore]] (transactional, reference parity with
  * `epic_watchdog` in PostgreSQL) when the watchlist is shared
  * infrastructure mutated by more than one driver or external tools. */
trait WatchStoreApi {
  import WatchStore._

  protected def spark: SparkSession

  /** All rows regardless of status. */
  def listAll(): DataFrame

  /** M1+J2: insert-returning with duplicate guard (validated row supplied
    * by the shared [[addWatch]]); must be atomic per backend. */
  protected def insertWatch(row: Row): Long

  /** M2 backend primitive: flip expired watches, return how many. */
  def expireDue(now: Timestamp = new Timestamp(System.currentTimeMillis())): Long

  /** S7+P3: the active watchlist — status 'watching' and inside the
    * temporal validity window, projected to the hot-path columns. */
  def watchlist(now: Timestamp = new Timestamp(System.currentTimeMillis())): DataFrame =
    listAll()
      .where(col("watch_status") === "watching" &&
        col("t_start") < lit(now) && col("t_end") > lit(now))
      .select(col("id"), col("source_name"), col("ra"), col("dec"),
        col("patch_type"))

  /** M1+J2: validate, derive, and insert a watch; returns the new id.
    * RA/Dec accept decimal degrees or sexagesimal strings (P10). Duration
    * is human-readable (P11); continuous mode pins t_end to
    * t_start + 99 y. The id (0 here) is assigned by the backend. */
  def addWatch(sourceName: String, ra: String, dec: String,
      author: String = "batman",
      reason: String = "Detection of a transient with EPIC",
      watchMode: String = "continuous",
      patchType: String = "3x3",
      duration: String = "7d",
      eventType: String = "Manual trigger",
      voevent: String = "",
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Long = {
    require(sourceName != null && sourceName.nonEmpty, "source_name required")
    require(Set("continuous", "timed").contains(watchMode),
      s"bad watch_mode: $watchMode")
    val raDeg = CoordParse.parseCoord(ra, hourAngle = true)
    val decDeg = CoordParse.parseCoord(dec, hourAngle = false)
    require(raDeg >= 0 && raDeg < 360, s"ra out of range: $raDeg")
    require(decDeg >= -90 && decDeg <= 90, s"dec out of range: $decDeg")
    val tEndMicros = watchMode match {
      case "continuous" => // 99 years, watch_dog.py:63-64 evident intent
        now.getTime * 1000L + (99L * 365.25 * 86400000000L).toLong
      case "timed" =>
        now.getTime * 1000L + CoordParse.durationToMicros(duration)
    }
    insertWatch(Row(0L, sourceName, raDeg, decDeg, author, now, now,
      new Timestamp(tEndMicros / 1000L), reason, watchMode, patchType,
      eventType, "watching", voevent))
  }

  /** C5: VOEvent intake — parse the IVOA VOEvent 2.0 XML, derive the watch
    * (position from WhereWhen, identity from Why/ivorn, event type from
    * the Concept), and store the raw XML in the voevent column like the
    * reference's table (pg_pixel_storage.py:74). The reference's handler
    * raises NotImplementedError (watch_dog.py:139-142); this implements
    * the published standard instead. */
  def addVoeventWatch(xml: String,
      author: String = "voevent",
      watchMode: String = "continuous",
      patchType: String = "3x3",
      duration: String = "7d",
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Long = {
    val v = VoEvent.parse(xml)
    addWatch(v.name, v.ra.toString, v.dec.toString, author = author,
      reason = (s"VOEvent ${v.ivorn}").trim,
      watchMode = watchMode, patchType = patchType, duration = duration,
      eventType = v.concept, voevent = xml, now = now)
  }
}

class WatchStore(protected val spark: SparkSession, path: String)
    extends WatchStoreApi {

  import WatchStore._

  /** All mutations serialize on a JVM-wide per-path lock: the socket
    * server handles each watch RPC on its own connection thread with its
    * own WatchStore instance, and an unserialized read→union→write would
    * lose one of two concurrent adds. (The reference gets this from DB
    * transactions; a parquet store must bring its own mutual exclusion.) */
  private val mutationLock = lockFor(path)

  /** All rows regardless of status. Reads resolve the newest immutable
    * snapshot directory eagerly, so the returned (lazy) DataFrame binds to
    * files no concurrent mutation will ever touch — a remote watch_source
    * RPC can land mid-micro-batch without a reader seeing an empty list or
    * a FileNotFoundException (the MVCC the reference gets from Postgres). */
  override def listAll(): DataFrame =
    try {
      latestSnapshot() match {
        case Some(snap) => spark.read.schema(schema).parquet(snap.toString)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
      }
    } catch { case _: Exception => spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema) }

  override protected def insertWatch(row: Row): Long =
      mutationLock.synchronized {
    val sourceName = row.getString(1)
    val existing = listAll().cache()
    try {
      val dup = existing.where(col("source_name") === sourceName &&
        col("watch_status") === "watching").limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        s"source '$sourceName' is already being watched")
      val nextId = existing.agg(coalesce(max(col("id")), lit(0L)))
        .head().getLong(0) + 1
      val withId = Row.fromSeq(nextId +: row.toSeq.tail)
      val added = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(withId), 1), schema)
      write(existing.unionByName(added))
      nextId
    } finally existing.unpersist()
  }

  /** M2: flip expired watches (t_end ≤ now, still 'watching') to 'watched';
    * returns how many flipped. The reference runs this on a 5 s scheduler
    * (M3); the streaming runner calls it once per micro-batch instead. */
  override def expireDue(now: Timestamp): Long =
      mutationLock.synchronized {
    val all = listAll().cache()
    try {
      val due = all.where(col("watch_status") === "watching" &&
        col("t_end") <= lit(now)).count()
      if (due > 0) write(all.withColumn("watch_status",
        when(col("watch_status") === "watching" && col("t_end") <= lit(now),
          lit("watched")).otherwise(col("watch_status"))))
      due
    } finally all.unpersist()
  }

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private val SnapName = raw"snap-(\d+)".r

  /** Highest-numbered published snapshot, if any. Legacy stores (parquet
    * files directly under `path`, the pre-snapshot layout) are read as
    * snapshot 0 and migrate forward on the next mutation. */
  private def latestSnapshot(): Option[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return None
    val snaps = fs.listStatus(root).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case SnapName(n) => Some((n.toLong, s.getPath))
          case _ => None
        }
    }.flatten
    if (snaps.nonEmpty) Some(snaps.maxBy(_._1)._2)
    else if (fs.listStatus(root).exists(_.getPath.getName.endsWith(".parquet")))
      Some(root) // legacy flat layout
    else None
  }

  /** Publish a new snapshot: write to a hidden temp dir, atomically rename
    * it to `snap-<n+1>`, then prune all but the newest few generations.
    * Readers that already resolved an older snapshot keep reading its
    * immutable files; keeping 3 generations makes a straggler reader
    * outliving 3 mutations the only (practically impossible) race. */
  private def write(df: DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val next = latestSnapshot() match {
      case Some(p) if p != root => p.getName match {
        case SnapName(n) => n.toLong + 1
        case _ => 1L
      }
      case _ => 1L
    }
    val tmp = new org.apache.hadoop.fs.Path(root, s".tmp-snap-$next")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.rename(tmp, new org.apache.hadoop.fs.Path(root, s"snap-$next"))
    // prune old generations (and any legacy flat files once migrated)
    fs.listStatus(root).foreach { s =>
      s.getPath.getName match {
        case SnapName(n) if n.toLong <= next - 3 => fs.delete(s.getPath, true)
        case f if s.isFile && f.endsWith(".parquet") && next >= 1 =>
          fs.delete(s.getPath, false)
        case f if s.isFile && (f == "_SUCCESS" || f.startsWith("._SUCCESS")) =>
          fs.delete(s.getPath, false)
        case _ =>
      }
    }
  }
}

object WatchStore {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)

  /** epic_watchdog schema (sql_scripts/create_pixel_tables.sql:36-51),
    * voevent kept as opaque XML text (SURVEY §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("source_name", StringType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("author", StringType),
    StructField("event_time", TimestampType),
    StructField("t_start", TimestampType),
    StructField("t_end", TimestampType),
    StructField("reason", StringType),
    StructField("watch_mode", StringType),
    StructField("patch_type", StringType),
    StructField("event_type", StringType),
    StructField("watch_status", StringType),
    StructField("voevent", StringType)))
}
