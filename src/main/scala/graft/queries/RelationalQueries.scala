package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The declared correctness query set (SURVEY.md §2.8) — capability parity
  * for every relational operator class the engine supports, expressed in the
  * DataFrame API so Catalyst plans them (predicate pushdown, column pruning,
  * broadcast joins, AQE all apply).
  *
  * Conventions (driver oracle contract):
  *  - every computed column is aliased identically here and in the oracle SQL;
  *  - every query ends in a total ORDER BY, so row order is deterministic;
  *  - money aggregates go through DECIMAL(18,2) so Spark and DuckDB sums are
  *    bit-identical (double summation order is not associative);
  *  - integer-kind columns are cast so Spark and DuckDB output types agree
  *    (Spark row_number→int vs DuckDB→bigint, etc. — handled in the SQL).
  *
  * Scale notes (100 TB): every query here is shuffle-minimal — dimension
  * joins (nation/region/supplier) are broadcast; fact-side aggregations are
  * partial (map-side combine) by construction because we use built-in
  * hash aggregates; sorts happen once, after aggregation, on reduced data.
  */
object RelationalQueries {

  private val dec2 = DecimalType(18, 2)
  private val dec3 = DecimalType(18, 3)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q01 scan + projection + filter + sort. Filter and 3-column projection
    * both push into the parquet scan (verify: PushedFilters in explain). */
  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Q02 equi inner join (broadcast dim) + hash aggregate. */
  def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("cnt"),
        // decimal-exact summation, DOUBLE output: the driver hashes cell
        // objects, and parquet DECIMAL vs DuckDB float64 never hash-match.
        sum(col("c_acctbal").cast(dec2)).cast(dec2).cast(DoubleType).as("bal"))
      .orderBy(col("n_name"))

  /** Q03 multi-way join + theta predicate on the fact side. */
  def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region")
      .join(broadcast(t(s, dir, "nation")),
        col("n_regionkey") === col("r_regionkey"))
      .join(t(s, dir, "supplier").where(col("s_acctbal") > 0),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("r_name"), col("n_name"))

  /** Q04 left semi join (IN subquery). */
  def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").where(col("o_totalprice") > 100000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q05 left anti join (NOT IN; the reference's insert-guard J2 shape). */
  def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q06 outer join with join-side predicate + null handling. */
  def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderstatus") === "F", "left")
      .select(col("c_custkey"),
        coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
      .orderBy(col("c_custkey"), col("ok"))

  /** Q07 group-ALL / bool aggregate (the all-or-nothing patch filter A1). */
  def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(when(col("l_quantity") < 49, 1).otherwise(0)).as("m"))
      .where(col("m") === 1)
      .select(col("l_orderkey"))
      .orderBy(col("l_orderkey"))

  /** Q08 distinct + UNION (set semantics). */
  def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("x"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("x")))
      .distinct()
      .orderBy(col("x"))

  /** Q09a INTERSECT. */
  def q09a(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("k"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  /** Q09b EXCEPT. */
  def q09b(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(col("n_nationkey").as("k"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  /** Q10 ranking window, top-k per group. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Q11 analytic window with frame spec (running sum — light-curve analog). */
  def q11(s: SparkSession, dir: String): DataFrame = {
    // l_linenumber is NOT unique per order in this dataset; the extra keys
    // make the ROWS frame (and so the running sum) deterministic.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(col("l_extendedprice").cast(dec2)).over(w).cast(dec2)
          .cast(DoubleType).as("run"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("run"))
  }

  /** Q12 ROLLUP (hierarchical aggregation). */
  def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last, col("cnt"))

  /** Q13 top-k by sort + limit (planned as TakeOrderedAndProject — no full
    * sort of the fact table at scale). */
  def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Q14 scalar string/date/math functions. */
  def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("pri"),
        col("o_orderdate").cast(DateType).as("d"),
        floor(col("o_totalprice") / 1000).as("kbucket"),
        length(col("o_orderstatus")).as("ls"))
      .orderBy(col("o_orderkey"))

  /** Q15 tumbling event-time window, batch form (S6's 5 s micro-window). */
  def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(dec3)).cast(dec3).cast(DoubleType).as("sv"))
      .orderBy(col("w"), col("event_type"))

  /** Q16 exact distinct count per group. */
  def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .orderBy(col("event_type"))

  /** Q17 explode/generator (patch-offset expansion G1). */
  def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        explode(sequence(lit(1), col("p_size") % 3 + 1)).as("off"))
      .orderBy(col("p_partkey"), col("off"))

  /** Q18 array aggregate: collect + sort (deterministic array build).
    * Output serialized to a canonical CSV string — the driver's pandas
    * harness cannot sort/hash array cells (numpy.ndarray is unhashable). */
  def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_join(
        array_sort(collect_list(col("l_linenumber")))
          .cast(ArrayType(StringType)), ",").as("lines"))
      .orderBy(col("l_orderkey"))

  /** Q19 correlated scalar subquery, decorrelated into agg + equi join —
    * the plan Catalyst's decorrelation would produce, written directly. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val avgPerCust = o.groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("ap"))
    o.join(avgPerCust, col("o_custkey") === col("ck"))
      .where(col("o_totalprice") > col("ap"))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Q20 the EPIC pipeline shape end-to-end on relational stand-ins:
    * broadcast join (J1) → explode (G1) → filter → group-ALL (A1). */
  def q20(s: SparkSession, dir: String): DataFrame =
    broadcast(t(s, dir, "nation"))
      .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
      .withColumn("off", explode(sequence(lit(0), lit(2))))
      .where(col("c_acctbal") + col("off") > 0)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("c"),
        min(when(col("c_custkey") > 0, 1).otherwise(0)).as("m"))
      .where(col("m") === 1)
      .select(col("n_name"), col("c"))
      .orderBy(col("n_name"))

  /** Q21 session windows — sessionization of the events stream per user
    * with a 12 h inactivity gap (`session_window` also runs under
    * Structured Streaming with a watermark; this is the batch-verifiable
    * form, oracled in DuckDB via lag + cumulative break-sum). */
  def q21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "12 hours").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("n_events"), col("last_ts"))
      .orderBy(col("user_id"), col("s_start"))

  /** Q22 as-of join — each error event attributed to the user's most
    * recent click at-or-before it (graft.operators.AsOfJoin: union+tag+
    * window, ONE shuffle by user, no range-join blowup; Spark has no
    * native ASOF JOIN). 105 of the errors at sf0.01 precede any click and
    * surface with null attribution, exercising the unmatched path. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.operators.AsOfJoin.asOf(errors, clicks,
        on = "user_id", time = "ts", ord = "event_id",
        pick = Seq("event_id" -> "click_id", "value" -> "click_value"))
      .select(col("event_id"), col("user_id"), col("click_id"),
        col("click_value"), round(col("value"), 4).as("err_value"))
      .orderBy(col("event_id"))
  }

  /** Q23 range join — per error event, the count and value-sum of the
    * same user's clicks within ±1 hour (graft.operators.RangeJoin:
    * time-banded equi-join on (user, bucket) + exact |Δt| filter — the
    * scale-safe form of a predicate Spark would otherwise plan as a
    * nested-loop). Zero-match errors surface with count 0 via the
    * aggregate-then-left-join pattern the operator scaladoc prescribes. */
  def q23(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val pairs = graft.operators.RangeJoin.within(errors, clicks,
      on = "user_id", time = "ts", radiusMicros = 3600000000L,
      pick = Seq("value" -> "click_value"))
    val agg = pairs.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"), sum(col("click_value")).as("sv"))
    errors.select(col("event_id"), col("user_id"))
      .join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_clicks"),
        round(coalesce(col("sv"), lit(0.0d)), 4).as("sum_click_value"))
      .orderBy(col("event_id"))
  }

  /** Q24 exact percentiles — median and p90 of event value per type.
    * `percentile` (exact, linear-interpolated) rather than
    * `percentile_approx`: the approximate sketch is the 100 TB default
    * but its t-digest boundaries differ across engines, so the oracle
    * gate covers the exact form and the approximate one stays a
    * documented swap (same call shape, no plan change). */
  def q24(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("med"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Q25 pivot — event counts per user decade, event types as columns
    * (`groupBy().pivot()` with an explicit value list: an enumerated
    * pivot never needs the extra distinct-values job, which at 100 TB is
    * a full extra scan). Absent combinations coalesce to 0 like the
    * oracle's FILTER counts. */
  def q25(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .withColumn("user_bucket", col("user_id") % 10)
      .groupBy(col("user_bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_bucket") +:
        types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
      .orderBy(col("user_bucket"))
  }

  /** Q26 lag/lead — per user in event order, the gap to the previous
    * event and the type of the next one. Ties on ts break by event_id
    * (unique), so frames are deterministic. The gap stays in INTEGER
    * microseconds: a seconds-double rounded to 4 places hits
    * representational ties where Spark's round (shortest-repr BigDecimal)
    * and DuckDB's (exact binary) disagree by one ulp of the last digit. */
  def q26(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("prev_gap_us"),
        col("next_type"))
      .orderBy(col("event_id"))
  }

  /** Q27 CUBE — order counts and value sums over every combination of
    * (returnflag, linestatus) including both subtotal planes and the
    * grand total (rollup's lattice-complete sibling; grouping-set nulls
    * are coalesced to markers so the oracle's GROUPING() spelling and
    * Spark's agree on output). */
  def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  /** Q28 GROUPING SETS — the explicit-lattice sibling of rollup/cube:
    * exactly the (status, priority), (status), and grand-total planes,
    * nothing else (a cube would add the (priority) plane nobody asked
    * for — at 100 TB each extra plane is a full extra aggregation pass).
    * Money goes through DECIMAL(18,2) on both sides so the sum is exact,
    * then DOUBLE for the driver's cell hash. */
  def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"), col("total"))
      .orderBy(col("st"), col("pri"))

  /** Q29 range-frame window — each event's trailing-one-hour activity for
    * its user: a RANGE frame over event-time microseconds, so rows with
    * equal timestamps land in the same frame regardless of tie order
    * (a ROWS frame would be nondeterministic under ts ties). The value
    * sum is integer-milli units via floor — windowed double summation
    * order differs across engines (DuckDB aggregates frames via a
    * segment tree), longs don't care. */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 1000).as("vm"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("vm")).over(w).as("v_1h"))
      .orderBy(col("event_id"))
  }

  /** Q30 first/last/nth window navigation — per user (event-time order,
    * event_id tiebreak): first, last, and second event types over the
    * whole-partition frame, collapsed to one row per user. The explicit
    * UNBOUNDED FOLLOWING frame matters: last_value over the default
    * frame is a footgun both engines share (it would return the CURRENT
    * row's value). */
  def q30(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** Q31 rank-family completeness — ntile/percent_rank/cume_dist in one
    * window. Determinism: the window orders by the unique o_orderkey, so
    * rank == row_number and the rank ratios are exact integer divisions —
    * both engines produce bit-identical doubles with no rounding step.
    * ntile is INT in Spark vs BIGINT in DuckDB (cast). */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** Q32 multiset set-ops — INTERSECT ALL / EXCEPT ALL (q09 covers the
    * distinct forms). Multiplicity preserved: a part key appearing 3× on
    * one side and 2× on the other survives INTERSECT ALL twice. Output
    * rows are (op, key) duplicates — deterministic under the total sort
    * because duplicate rows are indistinguishable. */
  def q32(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val a = li.where(col("l_quantity") > 45).select(col("l_partkey"))
    val b = li.where(col("l_discount") > lit(0.08)).select(col("l_partkey"))
    a.intersectAll(b).select(lit("ia").as("op"), col("l_partkey"))
      .unionAll(
        a.exceptAll(b).select(lit("ea").as("op"), col("l_partkey")))
      .orderBy(col("op"), col("l_partkey"))
  }

  /** Q33 UNPIVOT — melt the q25-style wide shape back to long form
    * (pivot's inverse completes the reshaping family). Absent
    * combinations are zero-filled BEFORE the melt on both engines: Spark
    * pivot yields NULL cells where DuckDB's FILTERed counts yield 0, and
    * unpivot would otherwise carry the difference into the rows. */
  def q33(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O"))
      .unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
        "l_linestatus", "cnt")
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** name → query fn, for SparkEntry. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_sort" -> (q01 _),
    "q02_join_agg" -> (q02 _),
    "q03_multijoin_theta" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q05_anti_join" -> (q05 _),
    "q06_outer_join" -> (q06 _),
    "q07_group_all" -> (q07 _),
    "q08_union_distinct" -> (q08 _),
    "q09a_intersect" -> (q09a _),
    "q09b_except" -> (q09b _),
    "q10_rank_window" -> (q10 _),
    "q11_running_window" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_topk" -> (q13 _),
    "q14_scalar_funcs" -> (q14 _),
    "q15_time_window" -> (q15 _),
    "q16_distinct_count" -> (q16 _),
    "q17_explode" -> (q17 _),
    "q18_array_agg" -> (q18 _),
    "q19_correlated_subquery" -> (q19 _),
    "q20_epic_shape" -> (q20 _),
    "q21_session_window" -> (q21 _),
    "q22_asof_join" -> (q22 _),
    "q23_range_join" -> (q23 _),
    "q24_percentile" -> (q24 _),
    "q25_pivot" -> (q25 _),
    "q26_lag_lead" -> (q26 _),
    "q27_cube" -> (q27 _),
    "q28_grouping_sets" -> (q28 _),
    "q29_range_frame" -> (q29 _),
    "q30_first_last" -> (q30 _),
    "q31_rank_family" -> (q31 _),
    "q32_multiset_ops" -> (q32 _),
    "q33_unpivot" -> (q33 _),
  )

  /** DuckDB-dialect oracle SQL, value- and type-aligned with the frames
    * above (casts documented in the object Scaladoc). */
  val oracles: Map[String, String] = Map(
    "q01_scan_filter_sort" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_join_agg" ->
      """SELECT n.n_name, COUNT(*) AS cnt,
        |       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q03_multijoin_theta" ->
      """SELECT r.r_name, n.n_name, COUNT(s.s_suppkey) AS n_supp
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN supplier s ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 0
        |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q06_outer_join" ->
      """SELECT c.c_custkey, COALESCE(CAST(o.o_orderkey AS BIGINT), -1) AS ok
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
        |ORDER BY c.c_custkey, ok""".stripMargin,
    "q07_group_all" ->
      """SELECT l_orderkey FROM lineitem
        |GROUP BY l_orderkey HAVING MIN(CASE WHEN l_quantity < 49 THEN 1 ELSE 0 END) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q08_union_distinct" ->
      """SELECT x FROM (SELECT DISTINCT c_nationkey AS x FROM customer
        |               UNION SELECT DISTINCT s_nationkey FROM supplier) t
        |ORDER BY x""".stripMargin,
    "q09a_intersect" ->
      """SELECT * FROM (
        |  SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier
        |) t ORDER BY k""".stripMargin,
    "q09b_except" ->
      """SELECT * FROM (
        |  SELECT n_nationkey AS k FROM nation EXCEPT SELECT s_nationkey FROM supplier
        |) t ORDER BY k""".stripMargin,
    "q10_rank_window" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q11_running_window" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |         OVER (PARTITION BY l_orderkey
        |               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS run
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, run""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, cnt""".stripMargin,
    "q13_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q14_scalar_funcs" ->
      """SELECT o_orderkey,
        |       UPPER(SUBSTRING(o_orderpriority, 1, 1)) AS pri,
        |       CAST(o_orderdate AS DATE) AS d,
        |       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS kbucket,
        |       CAST(LENGTH(o_orderstatus) AS INTEGER) AS ls
        |FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""".stripMargin,
    "q15_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type, COUNT(*) AS cnt,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DECIMAL(18,3)) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2
        |ORDER BY w, event_type""".stripMargin,
    "q16_distinct_count" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS u FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_explode" ->
      """SELECT p_partkey, off FROM (
        |  SELECT p_partkey, CAST(UNNEST(generate_series(1, p_size % 3 + 1)) AS INTEGER) AS off
        |  FROM part) t
        |ORDER BY p_partkey, off""".stripMargin,
    "q18_array_agg" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q19_correlated_subquery" ->
      """SELECT o_orderkey FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q20_epic_shape" ->
      """SELECT n_name, COUNT(*) AS c FROM (
        |  SELECT n.n_name, c.c_custkey, c.c_acctbal, t.off
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  CROSS JOIN (VALUES (0), (1), (2)) AS t(off)
        |) x WHERE c_acctbal + off > 0
        |GROUP BY n_name
        |HAVING MIN(CASE WHEN c_custkey > 0 THEN 1 ELSE 0 END) = 1
        |ORDER BY n_name""".stripMargin,
    "q21_session_window" ->
      """WITH e AS (SELECT user_id,
        |             -- truncate ns → µs (CAST rounds; Spark truncates)
        |             make_timestamp(epoch_ns(ts) // 1000) AS ts
        |           FROM events),
        |g AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                  IS NULL THEN 1
        |             WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                  >= INTERVAL 12 HOUR THEN 1
        |             ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, ts,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n_events,
        |       max(ts) AS last_ts
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q22_asof_join" ->
      """WITH ev AS (SELECT event_id,
        |              make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |              user_id, event_type, value FROM events),
        |u AS (
        |  SELECT user_id, ts, 1 AS is_click, event_id AS ord_id,
        |         event_id AS c_id, value AS c_value,
        |         CAST(NULL AS BIGINT) AS e_id, CAST(NULL AS DOUBLE) AS e_value
        |  FROM ev WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 0, event_id, NULL, NULL, event_id, value
        |  FROM ev WHERE event_type = 'error'),
        |w AS (SELECT *,
        |    last_value(c_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, is_click DESC, ord_id
        |       ROWS UNBOUNDED PRECEDING) AS click_id,
        |    last_value(c_value IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, is_click DESC, ord_id
        |       ROWS UNBOUNDED PRECEDING) AS click_value
        |  FROM u)
        |SELECT e_id AS event_id, user_id, click_id, click_value,
        |       round(e_value, 4) AS err_value
        |FROM w WHERE is_click = 0 ORDER BY event_id""".stripMargin,
    "q23_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        |           FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value
        |      FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id,
        |       CAST(count(c.us) AS BIGINT) AS n_clicks,
        |       round(coalesce(sum(c.value), 0), 4) AS sum_click_value
        |FROM e LEFT JOIN c
        |  ON c.user_id = e.user_id AND abs(e.us - c.us) <= 3600000000
        |GROUP BY e.event_id, e.user_id ORDER BY event_id""".stripMargin,
    "q24_percentile" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS med,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q25_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_lag_lead" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
        |                  event_type FROM events)
        |SELECT event_id, user_id,
        |       us - lag(us) OVER w AS prev_gap_us,
        |       lead(event_type) OVER w AS next_type
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY event_id""".stripMargin,
    "q27_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q28_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |       COALESCE(o_orderpriority, 'ALL') AS pri,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY st, pri""".stripMargin,
    "q29_range_frame" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
        |                  CAST(floor(value * 1000) AS BIGINT) AS vm
        |           FROM events)
        |SELECT event_id, user_id,
        |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |       CAST(sum(vm) OVER w AS BIGINT) AS v_1h
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q30_first_last" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id,
        |                  event_type FROM events)
        |SELECT DISTINCT user_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type,
        |       nth_value(event_type, 2) OVER w AS second_type
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,
    "q31_rank_family" ->
      """SELECT o_orderkey, o_orderpriority AS pri,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q32_multiset_ops" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 45),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_discount > 0.08),
        |ia AS (SELECT l_partkey FROM a INTERSECT ALL
        |       SELECT l_partkey FROM b),
        |ea AS (SELECT l_partkey FROM a EXCEPT ALL
        |       SELECT l_partkey FROM b)
        |SELECT 'ia' AS op, l_partkey FROM ia
        |UNION ALL
        |SELECT 'ea' AS op, l_partkey FROM ea
        |ORDER BY op, l_partkey""".stripMargin,
    "q33_unpivot" ->
      """WITH wide AS (SELECT l_returnflag,
        |    count(*) FILTER (WHERE l_linestatus = 'F') AS F,
        |    count(*) FILTER (WHERE l_linestatus = 'O') AS O
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, l_linestatus, cnt FROM
        |  (UNPIVOT wide ON F, O INTO NAME l_linestatus VALUE cnt)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
