package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults, so every entry point
  * (Bench, Verify, Sql, Plans, tests) builds an identically-configured
  * session:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` is set HERE, at session
  *    construction, not as a side effect of loading the `events` table:
  *    the flag changes how any TIMESTAMP(NANOS) parquet is read for the
  *    whole session, and a config with session-wide reach belongs in
  *    the builder, visible, not inside a loader.
  *  - UTC session time zone: the oracle (DuckDB) is zone-less; every
  *    timestamp comparison assumes wall-clock == UTC.
  *  - shuffle partitions sized to the local core count, not the 200
  *    default (on a real cluster this would be AQE + a per-job target).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
