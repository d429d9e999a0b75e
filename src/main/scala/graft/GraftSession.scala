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
  *  - `files.maxPartitionBytes` lowered from 128 MB to 16 MB: the test
  *    rig reads single-file tables (sf1 lineitem is one 115 MB file),
  *    and at the default every lineitem scan at sf1 collapses to ONE
  *    partition — a single-threaded scan feeding 32 idle cores
  *    (measured: q11's trivial distinct at 1.8 s vs 0.45 s). 16 MB
  *    keeps scan parallelism ≈ cores for the ~0.1–1 GB local inputs;
  *    on a real cluster this is tuned to the file/split layout, and
  *    100 TB inputs arrive as many files regardless.
  *  - `objectHashAggregate.sortBased.fallbackThreshold` raised from
  *    Spark's ultra-conservative 128 to 1M: at 128, ANY
  *    TypedImperativeAggregate grouped by a real key (BoundedTopK by
  *    doc_id — 200 k+ groups) abandons the hash map after the first
  *    128 groups and SORTS the entire partial-side stream by group
  *    key — for q120 at sf10 that is a ~10⁹-row sort whose cost
  *    scales with the candidate-pair volume, erasing the bound the
  *    partial heap exists to provide (measured: 61 s → see PLANS.md
  *    round 16). 1M hash entries × the engine's bounded states
  *    (k-heaps, small collect_lists) ≈ 150 MB per task worst case —
  *    inside a 1–4 GB executor-core budget at any scale, and
  *    partitions exceeding 1M distinct groups still fall back safely.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
