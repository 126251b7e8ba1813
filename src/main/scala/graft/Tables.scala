package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

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
    // events.ts is INT64 TIMESTAMP(NANOS); Spark has no nanosecond timestamp,
    // so sessions set spark.sql.legacy.parquet.nanosAsLong=true and we
    // truncate to microseconds here (Spark's native resolution).
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(StructField(n, _, _, _)) =>
        // integer `div`, NOT `/`: epoch-ns ≈ 1.7e18 exceeds double's 53-bit
        // mantissa, so float division silently perturbs the microseconds
        df.withColumn(n, timestamp_micros(expr(s"$n div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view (for spark.sql usage / REPL). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
