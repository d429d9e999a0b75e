package graft

import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Measures the documented scale mitigations for the superlinear
  * candidate-volume operators — currently the q57 blocking-resolution
  * knob: sign-bucket bits vs runtime vs recall at a given sf. The
  * claim in PLANS.md ("raise nbits as n grows to hold per-block work
  * constant, at the price of recall at the threshold boundary") is a
  * measurement away from being a fact; this main is that measurement.
  *
  *   sbt "runMain graft.ScaleKnobs testdata/sf10 4 6 8"
  */
object ScaleKnobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata/sf1")
    val bitsList =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(4, 6, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    println(s"# q57 blocking-resolution knob @ $sfDir " +
      s"(threshold 0.45 — q57's setting; 1 warm + 1 timed run each)")
    bitsList.foreach { bits =>
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = Similarity
          .cosinePairsBlocked(emb, "vec_id", "embedding", 0.45, bits)
          .count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run() // warm
      val (pairs, sec) = run()
      println(f"nbits=$bits%-2d buckets=${1 << bits}%-4d " +
        f"pairs=$pairs%12d  time=$sec%8.2f s")
    }
    // q45's analog dial: the n_chars blocking width. Narrower buckets
    // thin each block's quadratic candidate scan; pairs whose lengths
    // fall in different buckets are the recall price (the internal
    // token-count log-bucket already bounds the size RATIO, this key
    // bounds the absolute length band).
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"# q45 blocking-width knob @ $sfDir (threshold 0.8)")
    Seq(500, 250, 100).foreach { width =>
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.operators.Dedup.jaccardPairs(docs, col("doc_id"),
            col("text"),
            blockKeys = Seq(col("lang"),
              org.apache.spark.sql.functions
                .floor(col("n_chars") / width.toDouble).cast("int")),
            threshold = 0.8)
          .count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      run() // warm
      val (pairs, sec) = run()
      println(f"width=$width%-4d pairs=$pairs%12d  time=$sec%8.2f s")
    }
    spark.stop()
  }
}
