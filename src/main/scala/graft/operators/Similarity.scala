package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; the corpus side streams,
  * queries broadcast — at 100 TB this is the "small query batch × huge
  * corpus" shape, one pass, no shuffle of the corpus). Scale path:
  * sign-bit LSH bucketing so each query only scores its bucket —
  * trading recall for a corpus-partition-local join; an IVF variant
  * would swap the bucket fn for learned centroids, same plan shape.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine similarity.
    * `queries`/`corpus` need (`id`, `vec`) columns named by the params.
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     id: String, vec: String, k: Int,
                     roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms are precomputed per side (not per pair) — same arithmetic,
    // O(n) instead of O(n*q) sqrt work
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      l2Norm(col(vec)).as("qn"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      l2Norm(col(vec)).as("cn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      // round before ranking: an ULP of cross-engine divergence in the
      // dot product must not flip a rank
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Approximate top-k: both sides are hashed to a sign-bit bucket and
    * only same-bucket pairs are scored. Recall is tunable via `nbits`
    * (fewer bits → bigger buckets → higher recall & cost). Multi-probe
    * (also scoring neighboring buckets) would be the next refinement.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              id: String, vec: String, k: Int, nbits: Int,
              roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("qn"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("cn"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
              col("cos"), col("rank"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Exact O(n²) within — use only on bounded corpora or behind LSH
    * blocking; kept exact here as the correctness baseline.
    */
  def cosinePairs(df: DataFrame, id: String, vec: String,
                  threshold: Double, roundTo: Int = 9): DataFrame = {
    val a = df.select(col(id).as("id_a"), col(vec).as("va"),
      l2Norm(col(vec)).as("na"))
    val b = df.select(col(id).as("id_b"), col(vec).as("vb"),
      l2Norm(col(vec)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      // round before thresholding so borderline values can't split
      // between engines
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), roundTo))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
