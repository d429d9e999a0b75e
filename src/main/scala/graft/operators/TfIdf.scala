package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** TF-IDF term scoring over a document corpus — the standard signal
  * for keyword extraction and quality weighting in training-data
  * pipelines.
  *
  * The idf is the LOG-FREE rational form `n_docs / df`: a product of
  * two exact IEEE quotients is bit-reproducible across engines
  * (`ln` implementations are not guaranteed to agree in the last ulp),
  * which is what lets the score itself sit under a cross-engine hash
  * gate. Monotone in the usual `ln`-idf, so top-k per doc is the same
  * ranking a log formulation gives when df ordering decides.
  *
  * Scale: one explode + (doc,len,term) shuffle for the term counts;
  * the document-frequency table is VOCABULARY-sized and broadcast
  * back — the corpus is never shuffled on anything but its own keys.
  * The document length is `size(tokens)` carried from the SCAN
  * through the count aggregate (len is constant per doc, so adding
  * it to the grouping key changes no group) — a `sum(cnt) over
  * (partition by doc_id)` window would be a second full-corpus
  * exchange just to recompute a number the tokenizer already knew.
  * The only other exchange is the top-k window's, and Spark's
  * WindowGroupLimit prunes it to k candidates per doc per input
  * partition before the shuffle.
  */
object TfIdf {

  /** Top-`k` terms per document by tf-idf (ties broken by term). */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int,
               roundTo: Int = 9): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"), tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(col("toks")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("len"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfTbl), Seq("term"))
      .crossJoin(broadcast(nDocs))
      // (cnt/len) * (n/df) in exactly this association — mirrored in
      // the oracle so the doubles agree bit-for-bit; rounded before
      // ranking so a (hypothetical) ulp can't flip a rank
      .withColumn("tfidf", round(
        (col("cnt").cast("double") / col("len").cast("double")) *
          (col("n_docs").cast("double") / col("df").cast("double")), roundTo))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
  }
}
