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
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by
      // default; read the raw int64 nanos and truncate to microseconds
      // (exactly what DuckDB does when it coerces NANOS to its µs
      // timestamps). timestamp_ntz keeps it wall-clock like the source.
      // The nanosAsLong flag itself is set at session construction
      // (GraftSession) because it has session-wide reach; the require
      // here fails fast with a pointer instead of silently flipping
      // the session's parquet semantics from inside a loader.
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
          "false") == "true",
        "events needs spark.sql.legacy.parquet.nanosAsLong=true — " +
          "build the session via graft.GraftSession.builder")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast("timestamp_ntz"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
