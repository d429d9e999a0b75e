package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.TfIdf

/** A/B for the q69 round-16 rewrite (r16 verdict follow-up): the
  * doc-length carried from the scan through the (doc, len, term)
  * count aggregate (current TfIdf.topTerms) vs recomputed by a
  * `sum(cnt) OVER (PARTITION BY doc_id)` window after a (doc, term)
  * aggregate (the pre-r16 shape, one extra full-corpus exchange).
  * The rewrite won at sf10 (7.4 → 4.6 s) but the driver's sf0.1
  * bench moved 0.711 → 1.044 s the same round; this main measures
  * both variants isolated at the same scale points so the trade is a
  * table, not an inference.
  *
  *   sbt "runMain graft.AbQ69 <sfDir> [reps=7]"
  */
object AbQ69 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    // the round-16 "carried-len" shape, kept inline for the record:
    // len rides the aggregate key, which forces a SECOND doc-keyed
    // exchange (plus a per-partition top-k pre-sort of the whole tf
    // table) at the rank window — measured slower at every scale
    def carried(): DataFrame = {
      val toks = docs
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
          explode(col("toks")).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("len"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(dfTbl), Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(
          (col("cnt").cast("double") / col("len").cast("double")) *
            (col("n_docs").cast("double") / col("df").cast("double")), 9))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
    }
    // the shipped operator (windowed-len form, reinstated round 17)
    def windowed(): DataFrame =
      TfIdf.topTerms(docs, col("doc_id"), col("text"), 5)

    def med(f: () => DataFrame): (Double, Long) = {
      var n = 0L
      val ts = (0 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        n = f().count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (ts(ts.size / 2), n)
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("=== carried ==="); carried().explain("formatted")
      println("=== windowed ==="); windowed().explain("formatted")
    }
    // equality first: the two variants must agree exactly
    val eq = carried().except(windowed()).isEmpty &&
      windowed().except(carried()).isEmpty
    val (tC, nC) = med(carried _)
    val (tW, nW) = med(windowed _)
    println(f"""{"ab":"q69","sf":"$dir","reps":$reps,"equal":$eq,""" +
      f""""carried_sec":$tC%.3f,"windowed_sec":$tW%.3f,"rows":$nC}""")
    assert(nC == nW)
    spark.stop()
  }
}
