package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingExportSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select("doc_id", "text", "lang")

  test("export round-trips every row, sorted by key within each shard") {
    val out = Files.createTempDirectory("texport").toString
    val manifest = TrainingExport.export(docs, "doc_id", out, nShards = 8)
      .collect()
    assert(manifest.map(_.getLong(1)).sum === docs.count())
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // content parity, column-for-column
    assert(back.drop("shard").exceptAll(docs).isEmpty)
    assert(docs.exceptAll(back.drop("shard")).isEmpty)
    // every shard file is sorted by key: within each input file (one per
    // shard write task), doc_id must be nondecreasing
    import spark.implicits._
    val files = spark.read.parquet(out)
      .select(col("doc_id"),
        expr("regexp_extract(input_file_name(), '(shard=[0-9]+)', 1)")
          .as("sh"))
      .as[(Long, String)].collect().groupBy(_._2)
    files.foreach { case (_, rows) =>
      val ids = rows.map(_._1)
      // collect preserves file order per file; sorted layout ⇒ sorted ids
      assert(ids.sameElements(ids.sorted))
    }
  }

  test("shard assignment is content-keyed: stable across input layouts") {
    val a = TrainingExport
      .shardOf(col("doc_id"), 8)
    val viaOnePartition = docs.coalesce(1)
      .select(col("doc_id"), a.as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMany = docs.repartition(16, col("lang"))
      .select(col("doc_id"), a.as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaOnePartition === viaMany)
  }

  test("verify passes on an intact export and fails on a damaged one") {
    val out = Files.createTempDirectory("texport2").toString
    TrainingExport.export(docs, "doc_id", out, nShards = 4)
    assert(TrainingExport.verify(spark, out, "doc_id"))
    // damage: delete one shard directory entirely
    val shardDir = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).head
    shardDir.listFiles().foreach(_.delete())
    shardDir.delete()
    assert(!TrainingExport.verify(spark, out, "doc_id"))
  }
}
