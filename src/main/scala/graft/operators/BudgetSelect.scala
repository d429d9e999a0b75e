package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget curation: keep the best-scoring documents whose
  * cumulative token count fits a global budget — the "select the top
  * N tokens of data by quality" step of a training-data pipeline
  * (quality-classifier curation as in GPT-3/LLaMA-style pipelines).
  *
  * Semantics: order the corpus by (score DESC, tieBreak ASC), take the
  * longest prefix whose INCLUSIVE running token total stays <= budget.
  * One straggling over-budget document is not skipped for a smaller
  * later one (greedy prefix, not knapsack) — reproducible and
  * engine-independent.
  *
  * Scale: a literal `SUM OVER (ORDER BY score)` is a single global
  * sort+window — a non-starter at 100 TB. Like `Packing`, the prefix
  * sum decomposes into two levels:
  *   1. bucket documents by a monotone function of score (coarse
  *      histogram bin); per-bucket running totals partition by bucket,
  *      so the corpus-sized window never sees a global order;
  *   2. bucket offsets come from a window over #buckets rows — a
  *      bounded, broadcastable set (256 buckets regardless of corpus
  *      size).
  * The per-bucket aggregation reuses the window's own hash exchange
  * (same key), so the corpus is shuffled exactly once, on the bucket
  * key. Bucket skew = a score histogram spike; raising `buckets`
  * re-spreads it (resolution only affects balance, never the result,
  * because the bucketization is monotone in score).
  */
object BudgetSelect {

  /** Select rows until `budget` tokens are reached.
    *
    * Null scores are REJECTED at execution time (codegen'd
    * `raise_error`, no extra driver action): `least()` skips nulls, so
    * a null score would silently land in the top bucket yet sort
    * nulls-last inside it, corrupting every lower bucket's running
    * total — the caller must impute or filter first. Out-of-range
    * scores (outside [0, 1]) remain CORRECT: the bucketization is
    * monotone for any real score, range only affects bucket balance.
    *
    * Column contract: `cum_tokens` is the reserved output column, and
    * `__score`/`__ntok`/`__bucket`/`__cum_in`/`__offset` are reserved
    * internals — input frames carrying any of them are rejected
    * up-front rather than silently overwritten.
    *
    * @param score    quality score in [0, 1] (any monotone rescale of a
    *                 real classifier score); higher = kept first
    * @param nTok     per-row token count
    * @param tieBreak unique column making the order total (doc id)
    * @param budget   global inclusive token budget
    * @param buckets  score-histogram resolution for the two-level
    *                 prefix sum (correctness-neutral)
    * @return input rows that made the cut, with their global running
    *         total as `cum_tokens`
    */
  def selectByTokenBudget(df: DataFrame, score: Column, nTok: Column,
                          tieBreak: Column, budget: Long,
                          buckets: Int = 256): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(budget >= 0, "budget must be >= 0")
    val reserved = Seq("cum_tokens",
      "__score", "__ntok", "__bucket", "__cum_in", "__offset")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns collide with BudgetSelect's reserved names: " +
        s"${clash.mkString(", ")} — rename them before calling")
    val base = df
      .withColumn("__score",
        when(score.isNull, raise_error(lit(
          "BudgetSelect: null score — least() would silently route it " +
            "to the top bucket and corrupt lower buckets' running " +
            "totals; impute or filter nulls first"))
          .cast("double"))
          .otherwise(score))
      .withColumn("__ntok", nTok.cast("long"))
      // monotone coarse bin of the score: equal scores share a bucket,
      // so (bucket DESC, score DESC, tie ASC) == (score DESC, tie ASC)
      .withColumn("__bucket",
        least(floor(col("__score") * buckets), lit(buckets - 1L)).cast("int"))
    val inBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__score").desc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.withColumn("__cum_in", sum(col("__ntok")).over(inBucket))
    // Bucket totals from a SECOND, column-pruned scan with map-side
    // combine: its exchange carries #buckets rows per partition, and
    // the offset window runs over #buckets rows — both bounded
    // regardless of corpus size. (Packing reads its totals off the
    // shared windowed exchange instead, but that requires the narrow
    // frame both branches can canonicalize to; here the selection
    // must return the caller's full rows, whose pruning differs per
    // branch, so Catalyst would plan a second corpus-sized window —
    // measured in the q114 plan audit — where this agg is a cheap
    // pruned re-scan.)
    val offsets = base.groupBy(col("__bucket"))
      .agg(sum(col("__ntok")).as("__btotal"))
      .withColumn("__offset",
        coalesce(
          sum(col("__btotal")).over(
            Window.orderBy(col("__bucket").desc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bucket"), col("__offset"))
    cum.join(broadcast(offsets), "__bucket")
      .withColumn("cum_tokens", col("__offset") + col("__cum_in"))
      .filter(col("cum_tokens") <= budget)
      .drop("__score", "__ntok", "__bucket", "__cum_in", "__offset")
  }
}
