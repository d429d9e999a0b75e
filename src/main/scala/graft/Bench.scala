package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Q.bench == true) against
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line. A warmup query
  * runs first so JVM/codegen startup cost isn't attributed to whichever
  * query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchQueries.sorted
    val fns = SparkEntry.queries

    // warm methodology, symmetric with tools/bench_baseline.py: each
    // query runs once to warm (plan cache, file footers, codegen),
    // then the MEDIAN of 3 timed executions is reported — single-run
    // numbers at sf0.1 swing ±1-2 s with ambient load, medians keep
    // the round-over-round comparison stable.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results: Seq[(String, Option[Double])] = names.map { name =>
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          fns(name)(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      once() // warm
      val timed = (1 to runs).flatMap(_ => once()).sorted
      // a query that threw is reported as -1 and listed in "failed",
      // never as a near-zero time that silently improves the total
      name -> (if (timed.size == runs) Some(timed(runs / 2)) else None)
    }
    val failed = results.collect { case (n, None) => n }
    val total =
      if (failed.nonEmpty) -1.0 else results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The harness reading this line keeps only the tail of stdout, so
    // the JSON must stay compact: per-query times at ms precision, and
    // if the catalog grows past the budget, drop to centisecond
    // precision rather than let the line head get clipped.
    def num(dp: Int, x: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(x))
    def jsonLine(dp: Int): String = {
      val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + num(dp, v.getOrElse(-1.0))
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${num(3, total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    }
    val line = { val l3 = jsonLine(3); if (l3.length <= 1800) l3 else jsonLine(2) }
    println(line)
    spark.stop()
  }
}
