package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the single most recent
  * right row with `right.time <= left.time` (inclusive; or strictly
  * earlier) sharing the join key. Spark has no native ASOF JOIN; the
  * usual workarounds are a range join (quadratic blowup on busy keys) or
  * a per-row correlated subquery (one shuffle per probe). This operator
  * composes existing operators instead — the preferred shape before
  * reaching for a custom physical plan:
  *
  *   union(tagged left, tagged right)
  *     → window last(right-payload, ignoreNulls) per key ordered by time
  *     → filter back to left rows.
  *
  * Cost: ONE shuffle of left+right by key and a per-partition sort —
  * the same price as a regular sort-merge join, linear in rows, no
  * key-cardinality blowup. The matched payload rides as a struct, so all
  * picked columns come atomically from the SAME right row even when some
  * of its fields are null.
  *
  * Determinism: ties on `time` between right rows resolve to the largest
  * `ord` (a unique, non-null, ordering column both frames must carry —
  * an event id). A right and left row at equal time: the right row is
  * visible when `inclusive` (DuckDB ASOF's `>=` semantics), hidden when
  * strict.
  */
object AsOfJoin {

  /** @param left  probe side; all its columns pass through
    * @param right build side; only `pick`ed columns survive
    * @param on    equality key column name (present in both)
    * @param time  event-time column name (present in both)
    * @param ord   unique tie-break column name (present in both, non-null)
    * @param pick  right columns to attach, as (rightName, outputName)
    * @param inclusive right rows at exactly left.time match (default) */
  def asOf(left: DataFrame, right: DataFrame, on: String, time: String,
      ord: String, pick: Seq[(String, String)],
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(pick.map { case (r, o) => right(r).as(o) }: _*)
    val payloadType = {
      val fields = pick.map { case (r, o) =>
        org.apache.spark.sql.types.StructField(o,
          right.schema(r).dataType, nullable = true)
      }
      org.apache.spark.sql.types.StructType(fields)
    }
    // right rows carry the payload struct; left rows carry their own
    // columns; each side nulls the other's (types pinned explicitly)
    val rightTagged = right.select(
      Seq(col(on), col(time), lit(1).as("_asof_side"),
        col(ord).as("_asof_ord"), payload.as("_asof_r")) ++
        leftCols.filterNot(c => c == on || c == time).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      Seq(col(on), col(time), lit(0).as("_asof_side"),
        col(ord).as("_asof_ord"),
        lit(null).cast(payloadType).as("_asof_r")) ++
        leftCols.filterNot(c => c == on || c == time).map(col): _*)
    // inclusive: right sorts before left at equal time (side desc), so a
    // same-instant right row is already visible to the left row
    val sideOrder: Column =
      if (inclusive) col("_asof_side").desc else col("_asof_side").asc
    val w = Window.partitionBy(col(on))
      .orderBy(col(time).asc, sideOrder, col("_asof_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged.unionByName(rightTagged)
      .withColumn("_asof_m", last(col("_asof_r"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 0)
    matched.select(
      leftCols.map(col) ++
        pick.map { case (_, o) => col(s"_asof_m.$o").as(o) }: _*)
  }
}
