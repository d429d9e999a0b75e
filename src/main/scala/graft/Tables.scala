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

  /** Inferred-schema cache, keyed by table path. Every
    * `spark.read.parquet(path)` pays a one-stage driver job to read
    * footers for schema inference, and the engine reconstructs each
    * query's DataFrame per run — so the suite paid that job once per
    * table PER TIMED REP (measured: the first job of every timed pass
    * is `parquet at Tables.scala`, ~0.1 s of the local job-launch
    * floor). A production deployment reads these tables through a
    * catalog/metastore whose schema is known, not re-inferred per
    * query (guide §6 — manifest metadata beats per-query listing);
    * this cache is that, in-session: the FIRST load of a path infers
    * (and the bench's warmup run is defined to warm footers/plan
    * state), later loads pass the schema explicitly and skip the
    * inference job. Metadata only — every query still computes its
    * result from the parquet bytes.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** Cached-schema parquet read for the engine's materialized-index
    * layouts too (IVF index, containment index): they are re-read per
    * query construction at a session-stable path with a fixed schema,
    * so they pay the same per-rep inference job the test tables did.
    */
  private[graft] def readCached(spark: SparkSession, path: String): DataFrame = {
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two physical layouts over time:
      // TIMESTAMP(NANOS) (an int64 to Spark under the nanosAsLong
      // legacy flag — truncated to µs here, exactly what DuckDB does
      // when it coerces NANOS) and plain TIMESTAMP(MICROS). Dispatch
      // on the type the scan actually inferred so both layouts load
      // to the same timestamp_ntz column — engine code downstream
      // never sees the difference, and a re-generated dataset can't
      // silently break the loader again.
      // The nanosAsLong flag itself is set at session construction
      // (GraftSession) because it has session-wide reach; see the
      // catch around the read below.
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      // With nanosAsLong OFF, a TIMESTAMP(NANOS) file fails inside
      // spark.read.parquet's schema inference (raw "Illegal Parquet
      // type: INT64 (TIMESTAMP(NANOS,...))") — before any type
      // dispatch below could run. Catch that one failure and rethrow
      // with the fix, so a session built without GraftSession.builder
      // gets the pointer instead of a bare Parquet type error.
      val raw =
        try readCached(spark, s"$dir/$name.parquet")
        catch {
          case e: Exception
              if String.valueOf(e.getMessage).contains("NANOS") =>
            throw new IllegalStateException(
              "events needs spark.sql.legacy.parquet.nanosAsLong=true — " +
                "build the session via graft.GraftSession.builder", e)
        }
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case TimestampNTZType => raw
        case _: TimestampType =>
          raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
        case other => throw new IllegalStateException(
          s"unexpected events.ts type: $other")
      }
    } else readCached(spark, s"$dir/$name.parquet")

  /** Exact row count of a test table from its parquet FOOTERS —
    * driver-side metadata, zero Spark jobs (the q96 ParquetStats
    * pattern; r21). Identical to `load(...).count()` by parquet
    * format contract; falls back to the count job if the path is
    * missing (never the case for driver-generated dirs).
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    graft.sources.ParquetStats
      .rowCount(spark.sparkContext.hadoopConfiguration,
        s"$dir/$name.parquet")
      .getOrElse(load(spark, dir, name).count())

  /** (row count, max of an integral column) from parquet footers —
    * the zero-job form of [[graft.operators.BlockDials.countAndMax]]
    * for size-derived dials. Column-chunk statistics are exact for
    * integral types; an all-null or statistics-less column falls back
    * to the agg job. The path must exist either way: a missing table
    * makes the fallback's `load` throw (AnalysisException), the same
    * contract as [[load]] itself — never the case for Tables-backed
    * dirs.
    */
  def statsCountMax(spark: SparkSession, dir: String, name: String,
                    column: String): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = s"$dir/$name.parquet"
    (graft.sources.ParquetStats.rowCount(conf, path),
      graft.sources.ParquetStats.maxLong(conf, path, column)) match {
      case (Some(n), Some(mx)) => (n, mx)
      case _ =>
        graft.operators.BlockDials.countAndMax(
          load(spark, dir, name),
          org.apache.spark.sql.functions.col(column))
    }
  }
}
