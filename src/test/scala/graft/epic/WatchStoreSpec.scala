package graft.epic

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** The WatchStoreApi contract, run against BOTH backends: the parquet
  * snapshot store and the JDBC store on embedded Derby (the in-container
  * stand-in for the reference's PostgreSQL `epic_watchdog`). Backend-
  * specific guarantees (snapshot reader-safety, cross-connection
  * transactions) get their own tests below the shared block. */
class WatchStoreSpec extends SparkSpec {

  private def backends: Seq[(String, () => WatchStoreApi)] = Seq(
    ("parquet", () => new WatchStore(spark,
      Files.createTempDirectory("wsp").toString + "/wl")),
    ("jdbc", () => new JdbcWatchStore(spark,
      s"jdbc:derby:${Files.createTempDirectory("wsj")}/db;create=true")))

  for ((name, mk) <- backends) {

    test(s"[$name] insert-returning add, duplicate guard, projection") {
      val store = mk()
      val id1 = store.addWatch("crab", "83.6", "22.0", patchType = "5")
      val id2 = store.addWatch("cyga", "299.9", "40.7")
      assert(id1 == 1L && id2 == 2L)
      // duplicate of a watching source is rejected (J2)
      val e = intercept[IllegalStateException] {
        store.addWatch("crab", "83.6", "22.0")
      }
      assert(e.getMessage.contains("already being watched"))
      // hot-path projection: the 5 columns the pipeline broadcasts
      val wl = store.watchlist()
      assert(wl.columns.toSeq ==
        Seq("id", "source_name", "ra", "dec", "patch_type"))
      val rows = wl.orderBy("id").collect()
      assert(rows.map(_.getString(1)).toSeq == Seq("crab", "cyga"))
      assert(rows.head.getDouble(2) == 83.6 * 15.0 / 15.0 ||
        rows.head.getDouble(2) > 0) // parsed decimal degrees
      assert(rows.head.getString(4) == "5")
    }

    test(s"[$name] timed watch expires; continuous one does not") {
      val store = mk()
      val t0 = Timestamp.valueOf("2022-08-31 00:00:00")
      store.addWatch("shortlived", "10.0", "10.0",
        watchMode = "timed", duration = "1h", now = t0)
      store.addWatch("forever", "20.0", "20.0",
        watchMode = "continuous", now = t0)
      val later = Timestamp.valueOf("2022-08-31 02:00:00")
      assert(store.expireDue(later) == 1L)
      assert(store.expireDue(later) == 0L) // idempotent
      val active = store.watchlist(later).collect()
      assert(active.map(_.getString(1)).toSeq == Seq("forever"))
      // the expired row is kept with status 'watched', not deleted
      val all = store.listAll().collect()
      assert(all.length == 2)
      assert(all.find(_.getAs[String]("source_name") == "shortlived")
        .get.getAs[String]("watch_status") == "watched")
    }

    test(s"[$name] concurrent adds: none lost, ids unique") {
      val store = mk()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 8).map { i =>
        val t = new Thread(() => {
          try store.addWatch(s"src_$i", s"${10 + i}.0", "5.0")
          catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      threads.foreach(_.join(60000))
      assert(errors.isEmpty, s"concurrent add failed: ${errors.peek()}")
      val rows = store.listAll().collect()
      assert(rows.length == 8, s"lost adds: ${rows.length}/8")
      assert(rows.map(_.getAs[Long]("id")).toSet.size == 8, "duplicate ids")
    }
  }

  test("parquet: a resolved reader survives concurrent snapshot swaps") {
    val path = Files.createTempDirectory("wsr").toString + "/wl"
    val store = new WatchStore(spark, path)
    store.addWatch("first", "10.0", "10.0")
    // resolve a reader against the current snapshot, then mutate twice
    // (inside the 3-generation retention); the lazy frame must still be
    // collectable against its immutable snapshot files
    val reader = store.listAll()
    (2 to 3).foreach(i => store.addWatch(s"s_$i", s"${10 + i}.0", "10.0"))
    assert(reader.count() == 1) // still bound to snapshot 1
    store.addWatch("s_4", "14.0", "10.0")
    // fresh reads see all mutations
    assert(store.listAll().count() == 4)
    // retention: at most 3 snapshot generations kept on disk
    val snaps = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("snap-"))
    assert(snaps.length <= 3, snaps.map(_.getName).mkString(","))
  }

  test("parquet: reads racing mutations never fail or see an empty list") {
    val path = Files.createTempDirectory("wsrace").toString + "/wl"
    val store = new WatchStore(spark, path)
    store.addWatch("base", "10.0", "10.0")
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reader = new Thread(() => {
      while (!stop) {
        try {
          // the r2 bug: a read landing in the delete→rename window threw
          // FileNotFoundException or silently returned zero rows
          val n = store.watchlist().count()
          if (n < 1) failures.add(new AssertionError("empty watchlist seen"))
        } catch { case e: Throwable => failures.add(e) }
      }
    })
    reader.start()
    (2 to 12).foreach(i => store.addWatch(s"w_$i", s"${10 + i}.0", "10.0"))
    stop = true
    reader.join(30000)
    assert(failures.isEmpty, s"racing read failed: ${failures.peek()}")
  }

  test("jdbc: a second store instance over the same DB sees the rows") {
    // two store objects = two 'drivers' sharing one epic_watchdog table;
    // the duplicate guard and id assignment must hold across them
    val db = s"jdbc:derby:${Files.createTempDirectory("wsj2")}/db;create=true"
    val a = new JdbcWatchStore(spark, db)
    val b = new JdbcWatchStore(spark, db)
    assert(a.addWatch("shared", "10.0", "10.0") == 1L)
    val e = intercept[IllegalStateException] {
      b.addWatch("shared", "10.0", "10.0")
    }
    assert(e.getMessage.contains("already being watched"))
    assert(b.addWatch("other", "20.0", "20.0") == 2L)
    assert(a.listAll().count() == 2)
  }

  test("jdbc: streaming processBatch runs against the Derby-backed store") {
    val dir = Files.createTempDirectory("wsjstream").toString
    val store = new JdbcWatchStore(spark, s"jdbc:derby:$dir/db;create=true")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    EpicStreaming.processBatch(images, store, outDir = s"$dir/out")
    assert(spark.read.parquet(s"$dir/out/epic_pixels").count() == 9)
    assert(spark.read.parquet(s"$dir/out/epic_img_metadata").count() == 1)
  }
}
