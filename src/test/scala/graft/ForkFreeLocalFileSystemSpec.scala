package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class ForkFreeLocalFileSystemSpec extends SparkSpec {

  test("file:// resolves to the fork-free implementation in this session") {
    assert(ForkFreeLocalFileSystem.isActive(spark),
      "fs.file.impl did not take — local writes would fork per file")
  }

  test("writes still work end-to-end and land readable") {
    val dir = Files.createTempDirectory("forkfree").toString
    spark.range(100).select(col("id"), (col("id") * 2).as("v"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() === 100)
    assert(back.agg(sum("v")).head().getLong(0) === 9900)
  }

  test("setPermission applies the requested bits without a subprocess") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val f = Files.createTempFile("forkfree", ".bin")
    val p = new org.apache.hadoop.fs.Path(f.toUri)
    fs.setPermission(p,
      new org.apache.hadoop.fs.permission.FsPermission("640"))
    val perms = Files.getPosixFilePermissions(f)
    import java.nio.file.attribute.PosixFilePermission._
    assert(perms.contains(OWNER_READ) && perms.contains(OWNER_WRITE) &&
      perms.contains(GROUP_READ))
    assert(!perms.contains(OTHERS_READ) && !perms.contains(OWNER_EXECUTE))
  }
}
