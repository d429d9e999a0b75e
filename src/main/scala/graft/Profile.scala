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

    // fresh table instances per prefix build (shared vals would leak
    // resolved attribute ids across the independently-built plans)
    def tables() = {
      val c = Tables.load(spark, sfDir, "customer")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1999-01-01"))
      val l = Tables.load(spark, sfDir, "lineitem")
      val su = Tables.load(spark, sfDir, "supplier")
      val n = Tables.load(spark, sfDir, "nation")
      val r = Tables.load(spark, sfDir, "region")
        .filter(col("r_name") === "ASIA")
      (c, o, l, su, n, r)
    }

    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "1 lineitem scan" -> (() => tables()._3),
      "2 orders scan+filter" -> (() => tables()._2),
      "3 orders joins lineitem" -> (() => {
        val (_, o, l, _, _, _) = tables()
        o.join(l, o("o_orderkey") === l("l_orderkey"))
      }),
      "4 + customer" -> (() => {
        val (c, o, l, _, _, _) = tables()
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
      }),
      "5 + supplier (colocated cond)" -> (() => {
        val (c, o, l, su, _, _) = tables()
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey")
            && c("c_nationkey") === su("s_nationkey"))
      }),
      "6 full q56 (+nation/region+agg)" -> (() => {
        val (c, o, l, su, n, r) = tables()
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
          .orderBy(col("n_name"))
      }))

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
    // A/B: shuffled hash join vs sort-merge for the one real exchange
    // (orders joins lineitem) — SHJ skips both sort phases; spillable
    // since Spark 3.2 so it is not an OOM trade.
    val full = prefixes.last._2
    for (pref <- Seq("true", "false")) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
      time(full)
      val med = (1 to 5).map(_ => time(full)).sorted.apply(2)
      println(f"full q56 preferSortMergeJoin=$pref%-5s med=$med%6.3f s")
    }
    spark.conf.unset("spark.sql.join.preferSortMergeJoin")
    spark.stop()
  }
}
