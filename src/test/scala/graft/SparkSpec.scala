package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — lifecycle owned in ONE place
  * (the companion's [[SparkSpec.acquire]]), the r14 fix for the
  * teardown race: `target/test-reports` that round showed two suites
  * failing with "SparkContext was shut down" while both passed in
  * isolation, because every suite's `getOrCreate` trusted whatever
  * session the JVM already had — one stopped context (an sbt
  * cancellation is enough) poisoned every suite scheduled after it.
  * `acquire` revalidates under a lock and REBUILDS when the cached
  * context is stopped, so a kill can cost at most the suite it
  * interrupts, never the rest of the run. No suite may call
  * `spark.stop()` (dev mains own their sessions and may). */
trait SparkSpec extends AnyFunSuite {
  /** Stable identifier (so `import spark.implicits._` works) bound at
    * the suite's first use; the companion hands back the live shared
    * session, rebuilt first if something stopped it. */
  lazy val spark: SparkSession = SparkSpec.acquire()

  val sf0001 = "/root/testdata/sf0.001"

  /** The engine's PolyHash fold (TextFunctions.fingerprint / the DuckDB
    * oracle's ascii()-fold), for independent replays in specs — one
    * definition, so a change to the fingerprint arithmetic has exactly
    * one test-side site to update. */
  def polyHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((a, b) =>
      (a * 31 + (b & 0xff)) % 1000000007L)
}

object SparkSpec {
  private var current: SparkSession = _

  /** The run-wide session, built on first use and rebuilt iff its
    * context has been stopped. Synchronized: suites run in parallel in
    * this JVM, and two rebuilders racing `getOrCreate` after a stop
    * would hand one of them the other's half-initialized session. */
  def acquire(): SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      // a stopped session lingers as the builder's default/active —
      // clear both so getOrCreate constructs instead of returning it
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.hadoop.fs.file.impl",
          "graft.ForkFreeLocalFileSystem")
        .getOrCreate()
      current.sparkContext.setLogLevel("WARN")
    }
    current
  }
}
