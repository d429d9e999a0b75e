package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Catalog

/** End-to-end proof of the q56/q23/q80 layout-bound adjudication:
  * materialize orders+lineitem BUCKETED on the order key (the layout
  * a standing 100 TB warehouse would keep for its hottest fact-fact
  * join), run the same three queries against bucketed tables vs plain
  * parquet, and report times + shuffle-exchange counts. BucketingSpec
  * proves the plan property at fixture scale; this main measures the
  * end-to-end delta at sf1.
  *
  *   sbt "runMain graft.BucketedBench /root/repo/testdata/sf1 [buckets=16] [reps=5]"
  */
object BucketedBench {

  /** q23's join-agg body over injected frames (same code path as the
    * catalog query, minus the Tables.load so the layout is a knob). */
  private def q23(c: DataFrame, o: DataFrame, l: DataFrame): DataFrame =
    c.filter(col("c_mktsegment") === "BUILDING")
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Catalog.drevenueCol(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  private def q80(c: DataFrame, o: DataFrame, l: DataFrame): DataFrame =
    c.filter(col("c_mktsegment") === "BUILDING")
      .join(o.filter(col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(l.filter(col("l_shipdate") > lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Catalog.drevenueCol(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  private def q56(c: DataFrame, o: DataFrame, l: DataFrame,
                  su: DataFrame, n: DataFrame, r: DataFrame): DataFrame =
    c.join(o.filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1999-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Catalog.drevenueCol(col("l_extendedprice"), col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val buckets = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val plain: String => DataFrame = Tables.load(spark, dir, _)

    val t0 = System.nanoTime()
    Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey")).foreach {
      case (t, key) =>
        spark.sql(s"DROP TABLE IF EXISTS ${t}_bkt")
        plain(t).write.bucketBy(buckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(s"${t}_bkt")
    }
    val buildSec = (System.nanoTime() - t0) / 1e9
    val bkt: String => DataFrame = {
      case t @ ("orders" | "lineitem") => spark.table(s"${t}_bkt")
      case t                           => plain(t)
    }

    def variants(src: String => DataFrame) = Seq(
      "q23" -> (() => q23(src("customer"), src("orders"), src("lineitem"))),
      "q80" -> (() => q80(src("customer"), src("orders"), src("lineitem"))),
      "q56" -> (() => q56(src("customer"), src("orders"), src("lineitem"),
        src("supplier"), src("nation"), src("region"))))

    def shuffles(df: DataFrame): Int = {
      df.collect()
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    }

    println(s"# q56/q23/q80 bucketed-layout A/B @ $dir " +
      f"(buckets=$buckets, $reps reps; bucketed build $buildSec%.1f s)")
    println(f"${"query"}%-6s ${"layout"}%-9s ${"med_s"}%7s ${"min_s"}%7s " +
      f"${"hash_exchanges"}%15s")
    val results = collection.mutable.Map[String, Seq[Seq[org.apache.spark.sql.Row]]]()
    for ((layout, src) <- Seq("plain" -> plain, "bucketed" -> bkt);
         (name, mk) <- variants(src)) {
      val nShuffles = shuffles(mk()) // warm + plan
      val ts = (0 until reps).map { _ =>
        val t = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t) / 1e9
      }.sorted
      results(name) = results.getOrElse(name, Nil) :+ mk().collect().toSeq
      println(f"$name%-6s $layout%-9s ${ts(ts.size / 2)}%7.3f " +
        f"${ts.head}%7.3f $nShuffles%15d")
    }
    results.foreach { case (name, runs) =>
      require(runs.toSet.size == 1, s"$name results diverge across layouts")
    }
    println("layout-equivalence: all queries identical across layouts")
    Seq("orders_bkt", "lineitem_bkt")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
