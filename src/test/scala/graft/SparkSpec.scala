package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session via
  * getOrCreate; config matches Verify/Bench). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"

  /** The engine's PolyHash fold (TextFunctions.fingerprint / the DuckDB
    * oracle's ascii()-fold), for independent replays in specs — one
    * definition, so a change to the fingerprint arithmetic has exactly
    * one test-side site to update. */
  def polyHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((a, b) =>
      (a * 31 + (b & 0xff)) % 1000000007L)
}
