package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval construction: collapse
  * a change-event log into per-key validity intervals — consecutive
  * equal states merge into one segment with `[valid_from, valid_to)`
  * bounds, `valid_to` null on the open (current) segment. The standard
  * warehouse shape for "what was this entity's state at time T".
  *
  * Scale shape: everything is partitioned by the entity key — the
  * lag/segment pass, the per-segment aggregation, and the lead pass
  * all shuffle on narrow key-based hashes (no global sort). Segment
  * numbering is a running sum of change flags inside each key
  * partition, so a key's whole history must fit one partition's sort
  * spill budget — true of per-entity logs (bounded per-user history),
  * the same contract as any sessionizer.
  *
  * Determinism: rows are ordered by (ts, tiebreak) within a key, so
  * equal timestamps cannot reorder across engines; `seg` is surfaced
  * so downstream total orders exist even when two segments of one key
  * share a valid_from.
  */
object Scd2 {

  def collapse(df: DataFrame, key: String, state: String,
               ts: String, tiebreak: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key))
      .orderBy(col(ts), col(tiebreak))
    val seg = df
      .withColumn("prev", lag(col(state), 1).over(wOrd))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col(state), 1)
          .otherwise(0))
      .withColumn("seg", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val segs = seg.groupBy(col(key), col("seg"), col(state))
      .agg(min(col(ts)).as("valid_from"), count(lit(1)).as("n_events"))
    val wSeg = Window.partitionBy(col(key)).orderBy(col("seg"))
    segs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .select(col(key), col("seg"), col(state),
              col("valid_from"), col("valid_to"), col("n_events"))
  }
}
