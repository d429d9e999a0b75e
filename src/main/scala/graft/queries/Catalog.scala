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
  /** Decimal-summed double aggregate, identical text in Spark SQL and
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE).
    */
  def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,8))) AS DOUBLE)"

  /** Order-independent average: decimal sum cast to double, divided by
    * count (double/int64 division of identical inputs is identical).
    */
  def davg(x: String): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(30,8))) AS DOUBLE) / COUNT($x))"
}
