package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Pins the two properties the layout exists for: a filtered scan prunes
  * at the DIRECTORY level (PartitionFilters + only matching files read),
  * and the write produces O(1) files per partition directory rather than
  * the numTasks × numPartitions explosion. */
class PartitionedLayoutSpec extends SparkSpec {

  test("filtered scans prune partitions; writes stay one file per dir") {
    val root = Files.createTempDirectory("graft_part").toString
    val docs = Tables.load(spark, sf0001, "documents")
    PartitionedLayout.write(docs, root, Seq("lang"))

    val back = PartitionedLayout.read(spark, root)
    // row parity and schema survival (lang reconstructed from dirs)
    assert(back.count() === docs.count())
    assert(back.columns.toSet === docs.columns.toSet)

    val filtered = back.where(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("lang"), plan)
    // pruning is real: only the en/ directory survives partition pruning
    // (inputFiles reports the relation pre-pruning; the scan node's
    // selected partitions are what actually reads)
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val selected = scan.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath)
    assert(selected.nonEmpty)
    assert(selected.forall(_.contains("lang=en")), selected.mkString("\n"))
    assert(selected.length < back.inputFiles.length)
    // no small-files explosion: each partition dir holds exactly one file
    val perDir = back.inputFiles.groupBy(f =>
      f.substring(0, f.lastIndexOf('/')))
    assert(perDir.values.forall(_.length == 1),
      perDir.view.mapValues(_.length).toMap.toString)
    // and the pruned read returns the right rows
    assert(filtered.count() ===
      docs.where(col("lang") === "en").count())
  }
}
