package graft

import org.apache.spark.sql.functions._

/** Data contracts the oracle-determinism strategy relies on: every
  * column aggregated through Catalog's money-grid helpers must be
  * exactly 2-decimal-valued (the grid snap is lossless only then).
  * If driver data ever drifts off-grid, this fails before the oracle
  * gate silently diverges.
  */
class DataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val moneyCols = Seq(
    ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
    ("lineitem", "l_tax"), ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"), ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"), ("part", "p_retailprice"),
    ("events", "value"))

  test("decimal-grid aggregated columns are exactly 2-decimal-valued") {
    moneyCols.foreach { case (t, c) =>
      val offGrid = Tables.load(spark, dir, t)
        .filter(abs(col(c) * 100 - round(col(c) * 100)) > 1e-6)
        .count()
      assert(offGrid == 0, s"$t.$c has $offGrid off-grid values — " +
        "Catalog.m's DECIMAL(18,2) snap would be lossy")
    }
  }
}
