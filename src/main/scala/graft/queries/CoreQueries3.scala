package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Third tranche: TPC-H-shaped multi-join analytics, window-function
  * variants, string-function breadth, null-semantics joins.
  */
object CoreQueries3 extends Catalog {

  import Catalog.drevenueCol

  override val queries: Seq[Q] = Seq(

    // TPC-H Q5 shape: local-supplier revenue per nation inside one
    // region and a date band; exercises a 6-table join with the
    // c_nationkey = s_nationkey co-location condition
    Q("q56_regional_revenue",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1999-01-01"))
        val l = Tables.load(s, dir, "lineitem")
        val su = Tables.load(s, dir, "supplier")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey")
            && c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(drevenueCol(col("l_extendedprice"), col("l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  ${Catalog.drevenue("l_extendedprice", "l_discount")} AS revenue,
              |  COUNT(*) AS n_items
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |  AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1999-01-01'
              |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // window-function variants over an exact measure
    Q("q58_window_variants",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 9).as("pct_rank"),
            round(cume_dist().over(w), 9).as("cume"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  ROUND(percent_rank() OVER w, 9) AS pct_rank,
             |  ROUND(cume_dist() OVER w, 9) AS cume,
             |  CAST(rank() OVER w AS INTEGER) AS rnk,
             |  CAST(dense_rank() OVER w AS INTEGER) AS drnk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // string-function breadth
    Q("q59_string_breadth",
      (s, dir) => Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          rpad(col("p_type"), 20, ".").as("rpadded"),
          translate(col("p_name"), "aeiou", "AEIOU").as("swapped"),
          reverse(col("p_brand")).as("rev"),
          expr("left(p_name, 6)").as("l6"),
          expr("right(p_name, 4)").as("r4"),
          expr("repeat(p_brand, 2)").as("twice"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  lpad(p_brand, 12, '*') AS padded,
             |  rpad(p_type, 20, '.') AS rpadded,
             |  translate(p_name, 'aeiou', 'AEIOU') AS swapped,
             |  reverse(p_brand) AS rev,
             |  left(p_name, 6) AS l6,
             |  right(p_name, 4) AS r4,
             |  repeat(p_brand, 2) AS twice
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): group
    // orders by a nullable derived key and self-join on it null-safely
    Q("q67_null_safe_join",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .withColumn("band",
            when(col("o_totalprice") >= 100000,
              floor(col("o_totalprice") / 100000).cast("long")))
        val agg = o.groupBy(col("band")).agg(count(lit(1)).as("n"))
        val top = o.groupBy(col("band"))
          .agg(max(col("o_orderkey")).as("max_key"))
          .withColumnRenamed("band", "band2")
        agg.join(top, col("band") <=> col("band2"))
          .select(col("band"), col("n"), col("max_key"))
          .orderBy(asc_nulls_first("band"))
      },
      Some("""SELECT a.band, a.n, t.max_key FROM
             |  (SELECT CASE WHEN o_totalprice >= 100000
             |     THEN CAST(FLOOR(o_totalprice / 100000) AS BIGINT) END AS band,
             |     COUNT(*) AS n
             |   FROM orders GROUP BY 1) a
             |JOIN
             |  (SELECT CASE WHEN o_totalprice >= 100000
             |     THEN CAST(FLOOR(o_totalprice / 100000) AS BIGINT) END AS band,
             |     CAST(MAX(o_orderkey) AS BIGINT) AS max_key
             |   FROM orders GROUP BY 1) t
             |ON a.band IS NOT DISTINCT FROM t.band
             |ORDER BY a.band ASC NULLS FIRST""".stripMargin))
  )
}
