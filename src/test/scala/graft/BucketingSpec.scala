package graft


import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located joins via bucketing — the 100 TB path for fact-fact
  * joins that repeat a join key across stages: both sides bucketed on
  * the key join WITHOUT a shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle") {
    import org.apache.spark.sql.functions._
    // tables land in the default ./spark-warehouse (gitignored)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), "l_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    // force a non-broadcast join so the shuffle question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // bucketed scan satisfies the join's distribution: the only
      // allowed exchange is AQE's final-agg one, and with groupBy on
      // the same key there should be none at all
      assert(shuffles.isEmpty,
        s"expected no shuffle, got:\n${plan.toString.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
