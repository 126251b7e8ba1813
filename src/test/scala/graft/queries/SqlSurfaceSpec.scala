package graft.queries

import graft.{SparkSpec, Tables}

/** The engine's SQL surface: the survey's canonical ANSI texts run verbatim
  * through spark.sql over registered views and must agree with the
  * DataFrame-API builders row for row. Q19 runs in its original CORRELATED
  * form here — Catalyst's decorrelation produces the same result as the
  * hand-decorrelated DataFrame plan in RelationalQueries.q19. */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val ready = { Tables.registerAll(spark, sf0001); true }

  private def sqlMatchesDf(sql: String, name: String): Unit = {
    assert(ready)
    val viaSql = spark.sql(sql).collect().toSeq
    val viaDf = RelationalQueries.all(name)(spark, sf0001).collect().toSeq
    assert(viaSql.map(_.toString) == viaDf.map(_.toString),
      s"$name: SQL (${viaSql.size} rows) != DataFrame (${viaDf.size} rows)")
  }

  test("Q01 canonical SQL == DataFrame plan") {
    sqlMatchesDf(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q01_scan_filter_sort")
  }

  test("Q07 group-ALL SQL == DataFrame plan") {
    sqlMatchesDf(
      """SELECT l_orderkey FROM lineitem
        |GROUP BY l_orderkey
        |HAVING MIN(CASE WHEN l_quantity < 49 THEN 1 ELSE 0 END) = 1
        |ORDER BY l_orderkey""".stripMargin,
      "q07_group_all")
  }

  test("Q17 LATERAL VIEW explode SQL == DataFrame plan") {
    sqlMatchesDf(
      """SELECT p_partkey, off FROM part
        |LATERAL VIEW explode(sequence(1, p_size % 3 + 1)) t AS off
        |ORDER BY p_partkey, off""".stripMargin,
      "q17_explode")
  }

  test("Q19 CORRELATED subquery decorrelates to the same result") {
    sqlMatchesDf(
      """SELECT o_orderkey FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
      "q19_correlated_subquery")
  }

  test("Q12 ROLLUP SQL == DataFrame plan") {
    sqlMatchesDf(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, cnt""".stripMargin,
      "q12_rollup")
  }

  test("curation functions are callable from SQL and match the operators") {
    assert(ready)
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT redact_pii('mail a@b.example or +1-555-0100 at 10.0.0.1') r,
        |       token_count(' one two  three ') n,
        |       quality_score('the quick brown fox the quick brown fox') q
        |""".stripMargin).collect().head
    assert(r.getString(0) === "mail [EMAIL] or [PHONE] at [IP]")
    assert(r.getInt(1) === 3)
    // 4 distinct / 8 tokens × (8/100) = 0.04
    assert(r.getDouble(2) === 0.04)
    // and against the t02 operator on the real corpus: same quality column
    val viaSql = spark.sql(
      "SELECT doc_id, quality_score(text) q FROM documents ORDER BY doc_id")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val viaOp = LlmQueries.all("t02_quality_score")(spark, sf0001)
      .select("doc_id", "quality")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(viaSql === viaOp)
  }

  test("LATERAL correlated subquery decorrelates like the window top-k") {
    assert(ready)
    val viaSql = spark.sql(
      """SELECT c.o_custkey, t.o_orderkey
        |FROM (SELECT DISTINCT o_custkey FROM orders) c,
        |LATERAL (SELECT o_orderkey FROM orders o
        |         WHERE o.o_custkey = c.o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        |ORDER BY c.o_custkey, t.o_orderkey""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = RelationalQueries.all("q10_rank_window")(spark, sf0001)
      .drop("rk").orderBy("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
  }

  test("kmv_distinct is callable from SQL and matches the a02 operator") {
    assert(ready)
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT lang, round(kmv_distinct(fingerprint(text)), 4) kmv_est
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaOp = LlmQueries.all("a02_kmv_distinct")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(viaSql === viaOp)
  }
}
