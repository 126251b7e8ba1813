package graft.epic

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, PreparedStatement, SQLException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** In-memory JDBC stub (reflection proxies — java.sql interfaces are huge)
  * that records inserted rows and can inject executeBatch failures. It
  * models TRANSACTIONS the way a real DB does: executeBatch writes into a
  * per-connection pending buffer, `commit` publishes it to `rows`, and
  * `rollback`/`close` discards it. An injected failure writes HALF the
  * batch to pending before throwing — exactly the partial-batch state
  * that, under autocommit, would have been durable and then duplicated by
  * the replay. So the no-duplication test actually tests transactionality,
  * not just the retry loop. */
object StubDb {
  val Url = "jdbc:graftstub:mem"
  val rows = new ConcurrentLinkedQueue[Seq[Any]]()
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  val connectsOpened = new AtomicInteger(0)
  val failuresToInject = new AtomicInteger(0)
  val commits = new AtomicInteger(0)

  def reset(failures: Int = 0): Unit = {
    rows.clear(); batchSizes.clear()
    connectsOpened.set(0); failuresToInject.set(failures); commits.set(0)
  }

  private def dflt(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case _ => null
  }

  private class StmtHandler(pending: ArrayBuffer[Seq[Any]])
      extends InvocationHandler {
    private val params = ArrayBuffer[Any]()
    private val batch = ArrayBuffer[Seq[Any]]()
    override def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setObject" =>
          val idx = a(0).asInstanceOf[Integer].intValue()
          while (params.size < idx) params += null
          params(idx - 1) = a(1)
          null
        case "addBatch" => batch += params.toSeq; null
        case "executeBatch" =>
          if (failuresToInject.getAndUpdate(n => math.max(0, n - 1)) > 0) {
            // a real mid-batch failure leaves a prefix in the transaction
            pending ++= batch.take(batch.size / 2)
            throw new SQLException("injected connection failure")
          }
          pending ++= batch
          batchSizes.add(batch.size)
          new Array[Int](batch.size)
        case "close" => null
        case _ => dflt(m)
      }
  }

  private class ConnHandler extends InvocationHandler {
    private val pending = ArrayBuffer[Seq[Any]]()
    override def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
      m.getName match {
        case "prepareStatement" => Proxy.newProxyInstance(
          getClass.getClassLoader, Array(classOf[PreparedStatement]),
          new StmtHandler(pending))
        case "commit" =>
          commits.incrementAndGet()
          pending.foreach(rows.add); pending.clear(); null
        case "rollback" | "close" =>
          // an uncommitted transaction dies with the connection
          pending.clear(); null
        case _ => dflt(m)
      }
  }

  private object StubDriver extends Driver {
    override def connect(url: String,
        info: java.util.Properties): Connection =
      if (!acceptsURL(url)) null
      else {
        connectsOpened.incrementAndGet()
        Proxy.newProxyInstance(getClass.getClassLoader,
          Array(classOf[Connection]), new ConnHandler)
          .asInstanceOf[Connection]
      }
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith("jdbc:graftstub:")
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
  }

  DriverManager.registerDriver(StubDriver)
}

class JdbcSinkSpec extends SparkSpec {

  private def df3 = {
    import spark.implicits._
    (1 to 10).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "nm", "v")
      .coalesce(1)
  }

  test("rows append in batchSize groups over one connection per partition") {
    StubDb.reset()
    new JdbcSink(StubDb.Url, batchSize = 3).append(df3, "t")
    assert(StubDb.rows.size == 10)
    assert(StubDb.batchSizes.asScala.map(_.intValue()).toSeq == Seq(3, 3, 3, 1))
    assert(StubDb.connectsOpened.get == 1)
    // values arrive as plain JDBC scalars in column order
    assert(StubDb.rows.asScala.exists(r =>
      r(0) == 1L && r(1) == "name_1" && r(2) == 1.5))
  }

  test("failed batch reconnects and replays; nothing lost or duplicated") {
    StubDb.reset(failures = 1)
    new JdbcSink(StubDb.Url, batchSize = 4, retryDelayMs = 1)
      .append(df3, "t")
    // the injected failure left half its batch in the OLD connection's
    // open transaction — transactional batches mean the replay must not
    // see those rows twice (under autocommit this assert would fail)
    assert(StubDb.rows.size == 10)                 // replay, no loss
    assert(StubDb.rows.asScala.map(_(0)).toSet.size == 10) // no dupes
    assert(StubDb.connectsOpened.get == 2)         // the reconnect happened
    assert(StubDb.commits.get == 3)                // one commit per batch
  }

  test("batch still failing after maxRetries propagates the SQLException") {
    StubDb.reset(failures = 100)
    val e = intercept[Exception] {
      new JdbcSink(StubDb.Url, batchSize = 4, maxRetries = 2,
        retryDelayMs = 1).append(df3, "t")
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause != null) rootMsg(t.getCause)
      else String.valueOf(t.getMessage)
    assert(rootMsg(e).contains("injected"))
    assert(StubDb.connectsOpened.get == 3)         // initial + 2 retries
  }

  test("processBatch with the JDBC sink lands PG-formatted rows") {
    StubDb.reset()
    val store = new WatchStore(spark,
      java.nio.file.Files.createTempDirectory("wl").toString + "/wl")
    store.addWatch("center", "180.0", "34.0", patchType = "3x3")
    val images = ImageFixtures.imagesBinaryDf(spark,
      Seq("2022-08-31T23:29:10.000000"))
    val sink = EpicStreaming.jdbcBatchSink(
      new JdbcSink(StubDb.Url, batchSize = 100))
    EpicStreaming.processBatch(images, store, outDir = "/nonexistent",
      sink = Some(sink))
    // 9 pixel rows + 1 metadata row, geometry/array cells as PG literals
    assert(StubDb.rows.size == 10)
    val cells = StubDb.rows.asScala.flatten.collect {
      case s: String => s
    }.toSeq
    assert(cells.exists(_.startsWith("SRID=4326;POINT(")))
    assert(cells.exists(s => s.startsWith("{") && s.endsWith("}")))
  }
}
