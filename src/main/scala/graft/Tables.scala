package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an explicit `sfDir` so the same code runs at any scale
  * factor. At cluster scale these reads are plain parquet scans — Catalyst
  * pushes filters/column pruning into them, so query code should never
  * pre-materialize or cache these frames.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The driver has shipped events.ts under two encodings across rounds:
    // INT64 TIMESTAMP(NANOS) — Spark has no ns timestamp, so sessions set
    // spark.sql.legacy.parquet.nanosAsLong=true and we truncate to µs —
    // and TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
    // infers as TIMESTAMP_NTZ (rejected by unix_micros & friends). Both
    // normalize to the session-zone TIMESTAMP here; every engine session
    // pins spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is the
    // identity on the stored micros.
    df.schema.find(_.name == "ts") match {
      case Some(StructField(n, LongType, _, _)) =>
        // integer `div`, NOT `/`: epoch-ns ≈ 1.7e18 exceeds double's 53-bit
        // mantissa, so float division silently perturbs the microseconds
        df.withColumn(n, timestamp_micros(expr(s"$n div 1000")))
      case Some(StructField(n, TimestampNTZType, _, _)) =>
        df.withColumn(n, col(n).cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view (for spark.sql usage / REPL). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
