package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range (theta) containment join with first-match semantics
  * (SURVEY.md §2.4 J3/J4).
  *
  * The reference hand-rolls this as an O(n·m) per-row dict scan with a
  * first-match break (/root/reference/etl_cid10.py:296-313). Spark-first
  * design: a left BroadcastNestedLoopJoin on the containment predicate
  * (the ranges side is always small — broadcast it), then
  * row_number() == 1 per left key in `rangeOrder` to reproduce
  * first-match when ranges overlap.
  *
  * Scale: the probe side streams at full parallelism; the build side is
  * broadcast once per executor. For a large ranges side this would be
  * rewritten as a prefix-equi join (bucket ranges by a coarse prefix of
  * the key, equi-join on the bucket, then filter) — see
  * [[RangeJoin.bucketed]].
  */
object RangeJoin {

  /** Left-joins `left` to `ranges` where lo <= value <= hi; when several
    * ranges match, keeps the first under `rangeOrder`. Unmatched left
    * rows survive with nulls (their single null-extended row ranks 1).
    *
    * Duplicate left rows are preserved (the reference maps per row):
    * the dedup window partitions on a generated per-row id, not on a
    * user key — `leftKey` remains only as the shuffle hint for plans
    * that want key-partitioned output downstream.
    */
  def firstMatch(
      left: DataFrame,
      ranges: DataFrame,
      value: Column,
      lo: Column,
      hi: Column,
      leftKey: Seq[String],
      rangeOrder: Column): DataFrame = {
    val withId = left.withColumn("__row_id", monotonically_increasing_id())
    val joined = withId.join(
      broadcast(ranges), value >= lo && value <= hi, "left")
    val w = Window.partitionBy(col("__row_id"))
      .orderBy(rangeOrder.asc_nulls_first)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__row_id")
  }

  /** Map-only first-match for a CATALOG-SIZED ranges side: the ranges
    * are collected (same size contract as a broadcast build side) and
    * compiled into a first-match CASE chain
    * `WHEN pred(range_0) THEN 0 WHEN pred(range_1) THEN 1 …` evaluated
    * per probe row — a literal transcription of the reference's
    * first-match break loop (etl_cid10.py:303-310) — followed by one
    * broadcast equi-join on the matched ordinal to attach the range's
    * payload columns.
    *
    * Unlike [[firstMatch]], the probe side is never shuffled: at 100 TB
    * probe scale the row_number variant repartitions the whole fact
    * table on the left key just to deduplicate matches, while this is
    * a pure map + broadcast lookup. `pred` builds the containment
    * predicate for one collected range row (allowing OR-of-bounds
    * forms like J4's).
    */
  def firstMatchByCase(
      left: DataFrame,
      ranges: DataFrame,
      ordCol: String,
      pred: org.apache.spark.sql.Row => Column): DataFrame = {
    val collected = ranges.collect().sortBy(_.getAs[Long](ordCol))
    val chain = collected.foldRight(lit(null).cast("long")) { (row, acc) =>
      when(pred(row), lit(row.getAs[Long](ordCol))).otherwise(acc)
    }
    val r = ranges.withColumnRenamed(ordCol, "__range_ord")
    left.withColumn("__matched_ord", chain)
      .join(broadcast(r), col("__matched_ord") === col("__range_ord"), "left")
      .drop("__matched_ord", "__range_ord")
  }

  /** Scale path for a ranges side too large to broadcast: both sides are
    * expanded to coarse buckets (every bucket a range overlaps), then
    * equi-joined on the bucket and filtered by the exact containment
    * predicate — turning a nested-loop join into a shuffled hash join.
    *
    * `bucketOf(c)` must map a point to its bucket id; `bucketsOf(lo,hi)`
    * must enumerate every bucket id the range touches (as an array
    * column). Duplicate matches across buckets are impossible because a
    * point lives in exactly one bucket.
    */
  def bucketed(
      left: DataFrame,
      ranges: DataFrame,
      value: Column,
      lo: Column,
      hi: Column,
      bucketOf: Column => Column,
      bucketsOf: (Column, Column) => Column): DataFrame = {
    val l = left.withColumn("__bucket", bucketOf(value))
    val r = ranges.withColumn("__bucket", explode(bucketsOf(lo, hi)))
    l.join(r, Seq("__bucket"), "inner")
      .filter(value >= lo && value <= hi)
      .drop("__bucket")
  }
}
