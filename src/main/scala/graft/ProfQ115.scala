package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** q115 containment-dedup dials (dev measurement tool, PLANS.md):
  * for each threshold, time the full pipeline (enumerate → verify →
  * distinct → per-doc aggregate) and report the qualifying pair count
  * — the same pairs/time evidence ScaleKnobs records for q45/q57.
  * Warm once, median of `reps`.
  *
  * Usage: runMain graft.ProfQ115 [sfDir] [reps] [t1,t2,...]
  */
object ProfQ115 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val thresholds = args.lift(2)
      .map(_.split(",").map(_.toDouble).toSeq)
      .getOrElse(Seq(0.8, 0.9, 0.95, 0.99))
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    for (t <- thresholds) {
      def run(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val pairs = Dedup.containmentPairs(docs, col("doc_id"),
          col("text"), t)
        val row = pairs.agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("doc_small")).as("n_contained")).head()
        (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
      }
      // System.gc between executions (Bench does the same): shuffle
      // files of a finished job are only deleted when the
      // ContextCleaner sees its references collected — at realdocs
      // sf10 one execution spills tens of GB, and two uncollected
      // executions filled the disk (r19)
      run(); System.gc() // warm
      val runs = (1 to reps).map { _ => val r = run(); System.gc(); r }
      val med = runs.map(_._3).sorted.apply(reps / 2)
      println(f"[q115-dial] t=$t%.2f pairs=${runs.head._1}%d " +
        f"contained_docs=${runs.head._2}%d med=$med%.2f s")
    }
    spark.stop()
  }
}
