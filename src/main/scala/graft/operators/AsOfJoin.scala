package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key (pandas merge_asof /
  * DuckDB ASOF JOIN semantics, left outer).
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes built-ins with the union-and-carry-forward
  * pattern: both sides are unioned, ordered by (ts, side) per key
  * (right rows first on ties, so `<=` is inclusive), the right payload
  * is carried forward with last(ignoreNulls), and left rows are kept.
  * Cost: ONE shuffle on the key — the same lower bound a dedicated
  * sort-merge as-of operator would have — and the window scan is a
  * single forward pass per key.
  *
  * Right rows should be unique per (key, ts) for deterministic results
  * (dedupe upstream, e.g. with PriorityDedup); among equal (key, ts)
  * right rows the carried one is otherwise unspecified — the same
  * caveat DuckDB's ASOF JOIN has.
  */
object AsOfJoin {

  /** `rightCols` are the right-side columns to attach (each emitted as
    * `asof_<name>`, null when no right row precedes the left row).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val r = right.select(
      col(key), col(ts), payload.as("__rpay"), lit(0).as("__side"))
    val l = left.withColumn("__rpay",
        lit(null).cast(r.schema("__rpay").dataType))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match",
      F.last(col("__rpay"), ignoreNulls = true).over(w))
    val leftCols = left.columns.map(col)
    val attached = rightCols.map(c =>
      col("__match").getField(c).as(s"asof_$c"))
    carried.filter(col("__side") === 1)
      .select(leftCols ++ attached: _*)
  }
}
