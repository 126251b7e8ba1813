package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ParquetCompactorSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("compaction shrinks a file storm without changing the data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmp").toString + "/out"
    // a streaming sink's worth of tiny appends: 40 files for 1000 rows
    (0 until 4).foreach { b =>
      (0L until 250L).map(i => (b * 250L + i, s"row_${b * 250 + i}"))
        .toDF("id", "s").repartition(10)
        .write.mode("append").parquet(dir)
    }
    assert(parquetFiles(dir).size >= 40)
    val before = spark.read.parquet(dir).orderBy("id").collect()

    val res = ParquetCompactor.compact(spark, dir,
      targetFileBytes = 1L << 30, minFiles = 8)
    assert(!res.skipped && res.filesBefore >= 40 && res.filesAfter == 1)
    assert(parquetFiles(dir).size == 1)
    val after = spark.read.parquet(dir).orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
    // crash-safety leftovers are cleaned up
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.startsWith(".compact-")))
  }

  test("small directories are skipped (compaction itself costs a rewrite)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmpskip").toString + "/out"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(2)
      .write.parquet(dir)
    val res = ParquetCompactor.compact(spark, dir, minFiles = 8)
    assert(res.skipped && res.filesAfter == res.filesBefore)
  }

  test("partitioned mode compacts closed partitions, never the live one") {
    import spark.implicits._
    val root = Files.createTempDirectory("cmppart").toString + "/sink"
    (0 until 3).foreach { day =>
      (0L until 100L).map(i => (i, s"d$day"))
        .toDF("id", "s").withColumn("date", lit(s"2022-01-0${day + 1}"))
        .repartition(12)
        .write.mode("append").partitionBy("date").parquet(root)
    }
    val results = ParquetCompactor.compactPartitioned(spark, root,
      targetFileBytes = 1L << 30, minFiles = 4)
    // two closed partitions compacted; the live (latest) one untouched
    assert(results.size == 2 && results.forall(!_.skipped))
    assert(parquetFiles(s"$root/date=2022-01-01").size == 1)
    assert(parquetFiles(s"$root/date=2022-01-02").size == 1)
    assert(parquetFiles(s"$root/date=2022-01-03").size >= 12)
    // data (including the derived partition column) intact
    val got = spark.read.parquet(root)
    assert(got.count() == 300)
    assert(got.groupBy("date").count().collect()
      .forall(_.getLong(1) == 100L))
  }
}
