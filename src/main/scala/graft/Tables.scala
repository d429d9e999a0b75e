package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables
  * (see /root/repo/TESTDATA.md). All query catalog entries read through
  * here so scan options stay in one place.
  *
  * At 100 TB these would be partitioned/bucketed tables behind a
  * catalog; the API (name -> DataFrame) is the same either way, and
  * every downstream operator relies only on Catalyst pushdown (column
  * pruning + predicate pushdown reach the parquet scan), not on the
  * physical layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
