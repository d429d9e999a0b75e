package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority dedup (SURVEY.md §2.6 W1): per key, keep exactly one row —
  * the one ranking first under `priority`.
  *
  * The reference does this as a global sort + drop_duplicates keep-first
  * (/root/reference/etl_cid10.py:183-184); the pandas sort is an
  * unstable quicksort so ties are nondeterministic there. Here the
  * caller supplies a total order (include a unique tiebreaker in
  * `priority`) so results are reproducible.
  *
  * Scale: one hash-partition shuffle on `keys`, then a per-partition
  * sort — no global sort. At 100 TB this is embarrassingly
  * partitionable by key; skewed keys are handled by AQE skew-split
  * since row_number only needs per-key locality.
  */
object PriorityDedup {
  def apply(df: DataFrame, keys: Seq[String], priority: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(priority: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
