package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Second tranche of the general relational surface: full outer / cross
  * joins, IN- and scalar subqueries, conditional aggregation, HAVING,
  * regexp functions. Same determinism rules as CoreQueries.
  */
object CoreQueries2 extends Catalog {

  import Catalog.{dsumCol => dsum}

  override val queries: Seq[Q] = Seq(

    Q("q24_full_outer",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val a = o.filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_open"))
        val b = o.filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_filled"))
        a.withColumnRenamed("k", "ka")
          .join(b.withColumnRenamed("k", "kb"),
            col("ka") === col("kb"), "full_outer")
          .select(coalesce(col("ka"), col("kb")).as("custkey"),
                  col("n_open"), col("n_filled"))
          .orderBy(col("custkey"))
      },
      Some("""SELECT COALESCE(a.k, b.k) AS custkey, a.n_open, b.n_filled
             |FROM (SELECT o_custkey AS k, COUNT(*) AS n_open FROM orders
             |      WHERE o_orderstatus = 'O' GROUP BY 1) a
             |FULL OUTER JOIN
             |     (SELECT o_custkey AS k, COUNT(*) AS n_filled FROM orders
             |      WHERE o_orderstatus = 'F' GROUP BY 1) b
             |  ON a.k = b.k
             |ORDER BY custkey""".stripMargin)),

    Q("q25_cross_join",
      (s, dir) => {
        val r = Tables.load(s, dir, "region").select(col("r_name"))
        val st = Tables.load(s, dir, "orders")
          .select(col("o_orderstatus")).distinct()
        r.crossJoin(st).orderBy(col("r_name"), col("o_orderstatus"))
      },
      Some("""SELECT r_name, o_orderstatus
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
             |ORDER BY r_name, o_orderstatus""".stripMargin)),

    Q("q26_in_subquery",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val bigParts = Tables.load(s, dir, "part")
          .filter(col("p_size") > 40).select(col("p_partkey"))
        l.join(bigParts, l("l_partkey") === bigParts("p_partkey"), "left_semi")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                  col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"),
                   col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin)),

    Q("q27_conditional_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
            .as("n_discounted"),
          dsum(when(col("l_discount") > 0.05,
            col("l_extendedprice")).otherwise(lit(0.0))).as("disc_revenue"),
          count(when(col("l_quantity") >= 25, lit(1))).as("n_bulk"))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
              |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_discounted,
              |  ${Catalog.dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")}
              |    AS disc_revenue,
              |  COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    Q("q28_having",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n") >= 15)
        .orderBy(col("o_custkey")),
      Some(s"""SELECT o_custkey, COUNT(*) AS n,
              |  ${Catalog.dsum("o_totalprice")} AS spend
              |FROM orders GROUP BY o_custkey
              |HAVING COUNT(*) >= 15
              |ORDER BY o_custkey""".stripMargin)),

    Q("q29_regexp",
      (s, dir) => Tables.load(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
          col("p_name").rlike("o.*o").as("double_o"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
             |  regexp_matches(p_name, 'o.*o') AS double_o
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // correlated scalar subquery: parts priced above their brand's
    // average (decimal-averaged; Spark expresses it as a window
    // aggregate — the decorrelated plan — the oracle as the correlated
    // form)
    Q("q38_correlated_subquery",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_brand"))
        Tables.load(s, dir, "part")
          .withColumn("brand_avg",
            sum(Catalog.m(col("p_retailprice"))).over(w)
              .cast("double") / count(col("p_retailprice")).over(w))
          .filter(col("p_retailprice") > col("brand_avg"))
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_brand, p_retailprice
             |FROM part p
             |WHERE p_retailprice > (
             |  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             |         / COUNT(p2.p_retailprice)
             |  FROM part p2 WHERE p2.p_brand = p.p_brand)
             |ORDER BY p_partkey""".stripMargin)),

    // interpolated percentiles over an integer-valued measure (the
    // interpolation grid stays exactly representable, so Spark's
    // percentile and DuckDB's quantile_cont agree; rounded to absorb
    // formula-order ULPs)
    Q("q37_percentiles",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
             |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
             |  MIN(l_quantity) AS min_qty,
             |  MAX(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // skew-proof two-phase distinct count — must equal the plain
    // COUNT(DISTINCT) the oracle runs
    Q("q35_salted_distinct",
      (s, dir) => graft.operators.SkewJoin.saltedDistinctCount(
          Tables.load(s, dir, "lineitem"), "l_returnflag", "l_partkey",
          salts = 8)
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // scalar subquery: orders above the average price; the average is
    // decimal-summed so both engines filter on the identical double
    Q("q34_scalar_subquery",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val avgPrice = o.agg(Catalog.davgCol(col("o_totalprice")).as("a"))
        o.join(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("a"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice > (SELECT ${Catalog.davg("o_totalprice")}
              |                      FROM orders)
              |ORDER BY o_orderkey""".stripMargin))
  )
}
