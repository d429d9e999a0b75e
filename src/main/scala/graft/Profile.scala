package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the floor-bound star-join queries
  * (q56/q23/q80 family): times CUMULATIVE PREFIXES of q56's plan —
  * scan, +filter, +customer join, +lineitem join, +supplier join,
  * +agg — so the cost of each added stage is the delta between
  * consecutive rows. 5 warm reps each, median reported.
  *
  * This is the adjudication tool for "is the ~1 s at every scale an
  * avoidable stage or the local-mode stage-launch constant?": a stage
  * whose delta shrinks when data shrinks is data-bound (fixable); a
  * delta that stays flat from sf0.1 to sf1 is the scheduling floor.
  *
  *   sbt "runMain graft.Profile testdata/sf1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def c = Tables.load(spark, sfDir, "customer")
    def o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1999-01-01"))
    def l = Tables.load(spark, sfDir, "lineitem")
    def su = Tables.load(spark, sfDir, "supplier")
    def n = Tables.load(spark, sfDir, "nation")
    def r = Tables.load(spark, sfDir, "region")
      .filter(col("r_name") === "ASIA")

    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "1 lineitem scan" -> (() => l),
      "2 orders scan+filter" -> (() => o),
      "3 orders joins lineitem" -> (() => o.join(l,
        o("o_orderkey") === l("l_orderkey"))),
      "4 + customer" -> (() => c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))),
      "5 + supplier (colocated cond)" -> (() =>
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey")
            && c("c_nationkey") === su("s_nationkey"))),
      "6 full q56 (+nation/region+agg)" -> (() =>
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey")
            && c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(graft.queries.Catalog.drevenueCol(col("l_extendedprice"),
            col("l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    println(s"# q56 prefix profile @ $sfDir (median of 5, warm)")
    var prev = 0.0
    prefixes.foreach { case (label, f) =>
      time(f) // warm
      val med = (1 to 5).map(_ => time(f)).sorted.apply(2)
      println(f"$label%-32s med=$med%6.3f s  delta=${med - prev}%+6.3f s")
      prev = med
    }
    spark.stop()
  }
}
