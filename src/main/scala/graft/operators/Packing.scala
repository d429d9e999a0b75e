package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step of an LLM pretraining
  * pipeline: documents are laid end-to-end into one token stream in a
  * deterministic order, and the stream is cut into fixed-size context
  * windows. A document's window is decided by its START offset, i.e.
  * the exclusive prefix sum of token counts in stream order.
  *
  * The naive formulation is a running total over a GLOBAL ORDER BY —
  * one partition holding the whole corpus, the canonical scale
  * anti-pattern. This implements the classic two-level distributed
  * prefix sum instead:
  *
  *   1. bucket the order key monotonically (`floor(id / bucketWidth)`
  *      preserves order between buckets), shuffle once on the bucket,
  *      and take a window cumsum WITHIN each bucket;
  *   2. aggregate one total per bucket (map-side combined) and prefix-
  *      sum the bucket totals — a single-partition window over
  *      #buckets rows, which is corpus_size / bucketWidth: bounded
  *      and tiny (100 B docs at the default width is ~100 k rows,
  *      driver-trivial), never corpus-sized;
  *   3. broadcast the bucket offsets back and add them to the local
  *      cumsums.
  *
  * One data-sized shuffle total; nothing corpus-sized is ever
  * single-partition. The decomposition is pure integer arithmetic, so
  * the offsets — and the DuckDB oracle's single-window cumsum — agree
  * exactly.
  */
object Packing {

  /** One row per input document: (doc_id, n_tok, start, window_id)
    * where `start` is the exclusive prefix sum of `tokenCol` in
    * `idCol` order and `window_id = floor(start / budget)`.
    *
    * `idCol` must be unique (stream order must be total for the
    * prefix sum to be well-defined); `bucketWidth` only needs to keep
    * #buckets = id_range / bucketWidth manageable for the bucket-
    * offset window — correctness is width-independent.
    *
    * floor(start / budget) is computed in double arithmetic — exact
    * while the stream is under 2^53 tokens (9 × 10^15, ~18 PB of
    * 2-byte tokens), and identical in both engines below that.
    */
  def packByTokenBudget(docs: DataFrame, idCol: Column, tokenCol: Column,
                        budget: Int, bucketWidth: Long = 1L << 20)
      : DataFrame = {
    require(budget > 0 && bucketWidth > 0,
      "budget and bucketWidth must be positive")
    val tok = docs.select(idCol.cast("long").as("doc_id"),
      tokenCol.cast("long").as("n_tok"))
    val bucketed = tok.withColumn("bucket",
      floor(col("doc_id") / bucketWidth).cast("long"))
    // inclusive cumsum inside each bucket — partitionBy keeps every
    // window partition one bucket wide, so no partition exceeds
    // bucketWidth rows
    val localCum = sum(col("n_tok"))
      .over(Window.partitionBy(col("bucket")).orderBy(col("doc_id")))
    val local = bucketed.withColumn("local_cum", localCum)
    // exclusive prefix of the per-bucket totals: the only global
    // window, over #buckets rows (see scale note above). The total is
    // read off the shared windowed subtree as max(local_cum) — the
    // inclusive cumsum's last value — rather than re-aggregated from
    // the source, so Catalyst's ReuseExchange collapses both branches
    // onto ONE corpus scan and ONE data-sized shuffle (pinned in
    // PackingSpec).
    val totals = local.groupBy(col("bucket"))
      .agg(max(col("local_cum")).as("bucket_tok"))
    val offsets = totals.withColumn("bucket_start",
      coalesce(
        sum(col("bucket_tok")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("bucket_start"))
    local.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("n_tok"),
        (col("bucket_start") + col("local_cum") - col("n_tok"))
          .as("start"))
      .withColumn("window_id",
        floor(col("start") / budget).cast("long"))
  }
}
