package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-statistics language-model scoring: rate each document by
  * how "familiar" its tokens are under the corpus's own unigram
  * distribution — the classic cheap quality/outlier signal (a doc of
  * rare junk tokens scores low; boilerplate scores high) used to
  * stratify pre-training data before any neural scorer runs.
  *
  * The score is deliberately log-free: `ln` is not ulp-stable across
  * engines (see q69's TF-IDF note), so instead of mean log-prob we
  * surface the exact-rational mean token frequency — one IEEE double
  * division of exact integers, bit-identical everywhere — plus a
  * scale-invariant rare-token count (a token is rare when its count
  * is under 1/(rareFactor · n_vocab) of all tokens, i.e. rareFactor×
  * below the uniform share, so the flag survives data-size changes).
  *
  * Scale shape: one explode + groupBy(term) builds the vocab (token
  * skew is absorbed by map-side partial counts); the per-doc pass
  * joins tokens to the vocab — broadcast here (a unigram vocab is
  * millions of rows, comfortably broadcastable even at 100 TB corpus
  * size; if a tokenizer ever makes it bigger, dropping the hint falls
  * back to a shuffle hash join) — then aggregates on the doc key.
  */
object UnigramLm {

  def score(docs: DataFrame, id: String, text: String,
            rareFactor: Int = 4): DataFrame = {
    val toks = docs.select(col(id),
      explode(TextFunctions.tokens(lower(col(text)))).as("term"))
    val v = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val stats = v.agg(sum(col("cnt")).as("total"),
                      count(lit(1)).as("n_vocab"))
    val v2 = v.crossJoin(broadcast(stats))
      .withColumn("rare",
        col("cnt") * col("n_vocab") * lit(rareFactor) < col("total"))
      .select(col("term"), col("cnt"), col("rare"), col("total"))
    toks.join(broadcast(v2), Seq("term"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
           sum(col("cnt")).as("sum_cnt"),
           sum(when(col("rare"), 1L).otherwise(0L)).as("n_rare"),
           // constant across the corpus; carried per-group so the
           // final division needs no second scalar join
           first(col("total")).as("total"))
      .withColumn("avg_freq",
        round(col("sum_cnt").cast("double")
          / (col("total") * col("n_tokens")), 9))
      .drop("total")
  }
}
