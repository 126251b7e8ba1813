package graft.operators

import org.apache.spark.sql.SparkSession

/** WHEN to compact a standing index table — the decision rule between
  * the append paths ([[HnswGraph.append]], [[IvfIndex.appendCommit]])
  * and the maintenance they defer to ([[HnswGraph.compact]],
  * [[IvfIndex.compact]]). Appends are deliberately file-additive (one
  * file per touched bucket/list per batch — a 100 TB index absorbs a
  * batch at the cost of the batch), which degrades two things over
  * time: scan planning (footer reads grow with file count) and, for the
  * graph, recall (append-only edges are pruned per batch, not
  * globally — the staleness bound `HnswGraphSpec` pins). The policy
  * triggers on the layout itself: compact when any one bucket/list
  * holds more than `maxFiles` parquet files. File count — not append
  * count — is the right trigger because it is what actually degrades,
  * it survives process restarts (derived from the table, not from
  * in-memory counters), and it self-heals: a compact resets every
  * bucket to one file, so the policy re-arms automatically.
  *
  * Cost: one directory listing per decision — O(files), no data read.
  * The streaming ingest paths ([[graft.streaming.StreamingGraphAnn
  * .ingest]] / [[graft.streaming.StreamingAnn.ingest]]) evaluate it
  * once per micro-batch, after their append commits.
  */
object CompactPolicy {

  /** Max parquet-file count over the buckets/lists of `table`.
    * Understands all three standing-index layouts: `cid=`-partitioned
    * directories (the IVF inverted lists), NESTED partition directories
    * (the graph's `layer=/pt=` two-level layout — the walk recurses to
    * the leaf dirs and each leaf is one bucket), and flat bucketed
    * tables (files carry their bucket id as the `_NNNNN` suffix Spark's
    * bucketed writer emits). A flat file with no bucket suffix counts
    * as its own singleton group. A table whose location does not exist
    * yet (first run, nothing ingested) reads 0 — "nothing to compact",
    * not a stack trace (the CLI's `--max-files` gate hits this). */
  def maxFilesPerBucket(spark: SparkSession, table: String): Int = {
    // fresh-JVM path (the CLI): an in-memory catalog that never
    // registered the table still has its warehouse directory — resolve
    // the standing location directly, like table-read does
    val loc = if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
      new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    else new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) return 0
    def leafMax(p: org.apache.hadoop.fs.Path, nested: Boolean): Int = {
      val entries = fs.listStatus(p).toSeq
      val partDirs = entries.filter(s =>
        s.isDirectory && s.getPath.getName.contains("="))
      if (partDirs.nonEmpty)
        partDirs.map(d => leafMax(d.getPath, nested = true)).max
      else {
        val files = entries.map(_.getPath.getName)
          .filter(_.endsWith(".parquet"))
        if (files.isEmpty) 0
        else if (nested) files.size // a partition leaf IS one bucket
        else {
          // flat layout: group by the bucketed writer's _NNNNN suffix
          val bucketOf = "_(\\d{5})\\.".r
          files.groupBy(f =>
              bucketOf.findFirstMatchIn(f).map(_.group(1)).getOrElse(f))
            .valuesIterator.map(_.size).max
        }
      }
    }
    leafMax(loc, nested = false)
  }

  /** The decision: does `table`'s layout exceed `maxFiles` files in any
    * one bucket/list? */
  def shouldCompact(spark: SparkSession, table: String,
      maxFiles: Int): Boolean =
    maxFilesPerBucket(spark, table) > maxFiles
}
