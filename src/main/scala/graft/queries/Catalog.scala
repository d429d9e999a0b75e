package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over the test tables plus
  * (where SQL-expressible) the equivalent DuckDB oracle SQL.
  *
  * Determinism contract (the driver hash-compares rows):
  *  - every query ends in a total-order ORDER BY in BOTH engines;
  *  - double sums go through DECIMAL (order-independent exact
  *    arithmetic) and are cast back to double, so Spark's partial
  *    aggregation order vs DuckDB's cannot flip a low bit;
  *  - integer sums are CAST AS BIGINT in the oracle (DuckDB promotes
  *    to HUGEINT, Spark to LongType);
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline benchmark query (runs at sf0.1 in Bench) */
    bench: Boolean = true)

trait Catalog {
  def queries: Seq[Q]
}

object Catalog {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{count, lit, sum}
  import org.apache.spark.sql.types.DecimalType

  /** Money-grid decimal type. The test data's monetary columns are
    * exactly 2-decimal-valued, so casting the double BEFORE any
    * arithmetic lands both engines on the identical exact decimal.
    * (Casting a computed double instead is NOT safe: Spark rounds the
    * shortest decimal representation while DuckDB rounds the exact
    * binary expansion, and with enough rows the per-row 1-ulp
    * disagreements showed up in sf0.1 sums.)
    */
  val Money: DecimalType = DecimalType(18, 2)

  /** Spark-side grid snap. */
  def m(c: Column): Column = c.cast(Money)

  /** Exact decimal sum of a money column, surfaced as double. */
  def dsumCol(c: Column): Column = sum(m(c)).cast("double")

  /** Exact decimal revenue: sum(price * (1 - discount)) with both
    * operands grid-snapped first (product stays exact decimal).
    */
  def drevenueCol(price: Column, discount: Column): Column =
    sum(m(price) * (lit(1) - m(discount))).cast("double")

  /** Order-independent exact average of a money column. */
  def davgCol(c: Column): Column =
    sum(m(c)).cast("double") / count(c)

  /** DuckDB mirrors of the above. */
  def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  def drevenue(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"

  def davg(x: String): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x))"
}
