package graft

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.util.EnumSet

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem that never forks a subprocess.
  *
  * Hadoop's `RawLocalFileSystem.setPermission` shells out
  * (`Shell.execCommand("chmod", …)`) when the libhadoop native library is
  * absent — and it runs for EVERY created file (each parquet part, each
  * `.crc`, each commit temp). A Spark local[N] write stage makes N worker
  * threads fork the whole driver JVM concurrently for every file they
  * open; forking a multi-GB, heavily-threaded JVM serializes on the
  * process's memory-map lock and goes from ~10 ms to seconds under load.
  * Observed here: 32-thread parquet write stages spending minutes with
  * every worker inside `ProcessImpl.forkAndExec` while writing a few MB —
  * i.e. single-node ingest throughput was fork-bound, not compute-bound.
  *
  * The fix is a pure-JVM chmod: `Files.setPosixFilePermissions` does in a
  * syscall what the shell-out does in fork+exec+wait. Cluster deployments
  * with HDFS/S3 never hit this path (their FileSystem impls don't shell
  * out); this class makes LOCAL mode — every driver correctness/bench run,
  * and any single-node user of the library — behave the same way.
  *
  * Wire it per-session:
  * {{{
  *   .config("spark.hadoop.fs.file.impl",
  *           "graft.ForkFreeLocalFileSystem")
  * }}}
  */
class ForkFreeLocalFileSystem
    extends LocalFileSystem(new ForkFreeRawLocalFileSystem) {
  // Hadoop instantiates FileSystem impls reflectively via the no-arg
  // constructor; the delegate above replaces the fork-prone raw fs.
}

/** The raw `file://` fs with the shell-out chmod overridden. The override
  * is virtual-dispatched from every internal call site that matters —
  * notably `LocalFSFileOutputStream`'s constructor, which chmods each
  * newly created file. */
class ForkFreeRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val perms = EnumSet.noneOf(classOf[PosixFilePermission])
    val bits = permission.toShort
    def add(bit: Int, perm: PosixFilePermission): Unit =
      if ((bits & bit) != 0) { perms.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
  }
}

object ForkFreeLocalFileSystem {
  /** The session config pair, for builders that assemble options. */
  val ConfKey = "spark.hadoop.fs.file.impl"
  val ConfValue = "graft.ForkFreeLocalFileSystem"

  /** Verify the override is active for `file://` in this session — cheap
    * assertion for specs and mains (a misconfigured session silently
    * falls back to the forking implementation otherwise). */
  def isActive(spark: org.apache.spark.sql.SparkSession): Boolean =
    FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
      .isInstanceOf[ForkFreeLocalFileSystem]
}
