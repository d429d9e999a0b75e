package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: per corpus document, how many of its
  * distinct word n-grams also appear anywhere in an evaluation set.
  * This is the standard pre-training hygiene pass — before training,
  * every document sharing n-grams with held-out benchmarks is flagged
  * (and usually dropped) so eval scores measure generalization, not
  * memorization.
  *
  * Scale shape: the eval side (benchmark suites) is tiny relative to
  * the corpus, so its distinct n-gram hash set is BROADCAST; the
  * corpus is one scan — shingle, hash, broadcast-hash-join, then a
  * per-document aggregation on the document's own key (map-side
  * combinable, no hot-key skew: the corpus never shuffles on the
  * n-gram). N-grams travel as md5 hex (fixed 32 bytes), never as raw
  * text, so the broadcast and the join rows stay compact at 100 TB.
  */
object Decontaminate {

  /** One row per corpus document: distinct n-gram count, how many of
    * those n-grams hit the eval set, and the contamination flag.
    * Documents shorter than `n` tokens surface with n_grams = 0
    * (explode_outer keeps them; the null gram row counts as nothing).
    *
    * Shingle+hash runs through the one-pass ShingleMd5 expression:
    * the composed md5∘explode∘array_distinct∘shingles form pays the
    * interpreted higher-order transform per element (measured 13×
    * slower on this exact scan — see ShingleMd5's docs).
    */
  def overlap(corpus: DataFrame, evalSet: DataFrame, id: String,
              text: String, n: Int): DataFrame = {
    val grams =
      graft.functions.expressions.ShingleMd5
        .shingleMd5(TextFunctions.tokens(col(text)), n)
    val evalGrams = evalSet
      .select(explode(grams).as("egram"))
      .distinct()
    val corpusGrams = corpus
      .select(col(id), explode_outer(grams).as("cgram"))
    corpusGrams
      .join(broadcast(evalGrams), col("cgram") === col("egram"), "left")
      .groupBy(col(id))
      .agg(count(col("cgram")).as("n_grams"),
           count(col("egram")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
