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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchQueries.sorted
    val fns = SparkEntry.queries

    // warm methodology, symmetric with tools/bench_baseline.py: each
    // query runs once to warm (plan cache, file footers, codegen),
    // then the second execution is timed
    val results = names.map { name =>
      try fns(name)(spark, sfDir).count() catch { case _: Throwable => }
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
