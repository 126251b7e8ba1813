package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def buildIndex(): Unit = {
    import spark.implicits._
    val assigned = (1 to 400)
      .map(i => (i.toLong, Array.fill(4)(i.toDouble), i.toLong % 8))
      .toDF("vec_id", "v", "cid")
    IvfIndex.write(assigned, "ivf_spec_index")
  }

  test("kFor: smallest power of two whose square covers the corpus, " +
      "floored at 8 — the boundaries the SQL oracle derives") {
    assert(IvfIndex.kFor(1L) === 8L)
    assert(IvfIndex.kFor(64L) === 8L)      // 8² = 64 exactly
    assert(IvfIndex.kFor(65L) === 16L)
    assert(IvfIndex.kFor(500L) === 32L)    // sf0.01 — oracle-checked
    assert(IvfIndex.kFor(20000L) === 256L) // x10: lists ≈ 78 wide
    assert(IvfIndex.kFor(60000L) === 256L) // x30: lists ≈ 234 wide
    assert(IvfIndex.kFor(1L << 40) === (1L << 20)) // 1 T → 1 Mi lists
  }

  test("write/read round-trips the assignment, partition column intact") {
    buildIndex()
    val back = IvfIndex.read(spark, "ivf_spec_index")
    assert(back.count() == 400)
    assert(back.schema("cid").dataType.typeName == "long")
    val perList = back.groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perList.keySet == (0L to 7L).toSet)
    assert(perList.values.forall(_ == 50L))
  }

  test("a literal probe reads only its inverted list (static pruning)") {
    buildIndex()
    val probe = IvfIndex.read(spark, "ivf_spec_index")
      .where(col("cid") === 3L)
    probe.collect()
    val scans = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the cid predicate must land in PartitionFilters (directory-level
    // pruning), not DataFilters (row-level, after reading everything)
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("cid"))),
      probe.queryExecution.executedPlan.toString)
  }

  test("append adds a delta batch without rewriting untouched lists") {
    import spark.implicits._
    buildIndex()
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val untouched = Paths.get(warehouse, "ivf_spec_index", "cid=5")
    val before = Files.list(untouched).iterator().asScala
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p))
      .toMap
    // delta lands only in lists 0..3
    val delta = (401 to 440)
      .map(i => (i.toLong, Array.fill(4)(i.toDouble), i.toLong % 4))
      .toDF("vec_id", "v", "cid")
    IvfIndex.append(delta, "ivf_spec_index")
    val back = IvfIndex.read(spark, "ivf_spec_index")
    assert(back.count() == 440)
    val perList = back.groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perList(5L) == 50L && perList(3L) == 60L)
    // the untouched list's files are byte-for-byte the ones written before
    val after = Files.list(untouched).iterator().asScala
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p))
      .toMap
    assert(after == before)
  }

  test("compact merges appended list files; data and pruning intact") {
    import spark.implicits._
    buildIndex()
    // three delta batches touch lists 0..3 → 4 files in each touched list
    (1 to 3).foreach { b =>
      val delta = (500 + b * 100 to 539 + b * 100)
        .map(i => (i.toLong, Array.fill(4)(i.toDouble), i.toLong % 4))
        .toDF("vec_id", "v", "cid")
      IvfIndex.append(delta, "ivf_spec_index")
    }
    val before = IvfIndex.read(spark, "ivf_spec_index")
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val res = IvfIndex.compact(spark, "ivf_spec_index", minFiles = 2)
    val byDir = res.map(r => r.dir.split('/').last -> r).toMap
    assert(!byDir("cid=0").skipped && byDir("cid=0").filesBefore == 4 &&
      byDir("cid=0").filesAfter == 1)
    // single-file untouched lists are left alone (no wasted rewrite)
    assert(byDir("cid=5").skipped && byDir("cid=5").filesAfter == 1)
    val after = IvfIndex.read(spark, "ivf_spec_index")
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(after === before)
    // the compacted table still partition-prunes
    val probe = IvfIndex.read(spark, "ivf_spec_index")
      .where(col("cid") === 2L)
    assert(probe.count() == 80L)
    val scans = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("cid"))))
  }

  test("each inverted list is O(1) files (writer repartitions by cid)") {
    buildIndex()
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val root = Paths.get(warehouse, "ivf_spec_index")
    val listDirs = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("cid=")).toSeq
    assert(listDirs.size == 8)
    listDirs.foreach { d =>
      val files = Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1,
        s"expected one file per inverted list, got ${files.size} in $d")
    }
  }
}
