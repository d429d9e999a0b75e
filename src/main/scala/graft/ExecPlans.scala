package graft

/** EXECUTED-plan auditor — the post-AQE sibling of [[Plans]] (which
  * prints the static `explain("formatted")`, where AQE's final join
  * strategies, stage reuse and coalescing are not yet decided). Runs
  * each named catalog query to completion, then prints
  * `queryExecution.executedPlan`, which is what PlansSpec asserts
  * against. This is how the r21 recompute findings were made visible
  * (q115's 20 parquet scans, q69's duplicated explode subtree) — the
  * static plan shows each subtree once however many times it runs.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ExecPlans q115_containment_dedup ..."
  */
object ExecPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"\n======== $n (executed) ========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
