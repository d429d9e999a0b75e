package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded training-data materializer: lay a corpus out as one
  * directory per shard (`shard=XX/part-*.parquet`), rows ordered
  * WITHIN each shard by the deterministic shuffle key — the on-disk
  * contract of q106's md5 sharding, i.e. what a trainer's data loader
  * actually reads and what a resumed run must re-materialize
  * identically.
  *
  * Plan shape (the part that must scale): exactly ONE hash exchange on
  * the shard id (`repartition(col)`), then `sortWithinPartitions` —
  * a per-partition sort, never a global one — then the partitioned
  * writer. Spark's `partitionBy` on an already-shard-partitioned
  * frame writes each shard's rows from the tasks that own them, so
  * a shard's files are internally sorted and no task writes to two
  * shards (one file per shard per task; with the default one-to-one
  * mapping here, one file per shard).
  *
  * The key travels as a column so the sort and the downstream reader
  * agree on order without recomputing the hash.
  */
object ShardedSink {

  /** Write `df` under `outDir` partitioned by an md5 shard of `id`
    * (`nibbles` hex chars → 16^nibbles shards), each shard ordered by
    * the full digest. Returns the frame as written (shard + sort key
    * included) for callers that want to verify or count.
    */
  def writeSharded(df: DataFrame, id: Column, outDir: String,
                   nibbles: Int = 2): DataFrame = {
    require(nibbles >= 1 && nibbles <= 8,
      s"nibbles must be in [1, 8], got $nibbles")
    val keyed = df
      .withColumn("shuffle_key", md5(id.cast("string")))
      .withColumn("shard", substring(col("shuffle_key"), 1, nibbles))
    val laid = keyed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
    laid.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    laid
  }

  /** Read a `writeSharded` layout back from the files, verifying the
    * durable contract IN-PLAN (assert_true throws on the first
    * violation at the caller's next action):
    *  - the directory's `shard` value equals the md5 prefix recomputed
    *    from the row's id (no row sits in the wrong shard directory);
    *  - the persisted `shuffle_key` equals md5(id) (the key column was
    *    not tampered with or mis-written);
    *  - `shuffle_key` is non-decreasing in `_metadata.row_index` order
    *    within every parquet file (the intra-shard sort survived the
    *    writer). The order check is a per-FILE window — parallelism =
    *    #files, never a global sort, so the verification itself scales
    *    like the scan.
    *
    * Returns the verified doc-level rows (original columns plus
    * `shard` and `shuffle_key`), for re-aggregation or re-feeding a
    * loader.
    */
  def readVerified(spark: org.apache.spark.sql.SparkSession,
                   outDir: String, id: Column,
                   nibbles: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perFile = Window.partitionBy(col("_f")).orderBy(col("_ri"))
    // Hive partition discovery may type-infer `shard` as int when every
    // populated directory name is all-digits (plausible on tiny
    // corpora), dropping leading zeros ('07' → 7). lpad after the
    // string cast restores the canonical `nibbles`-wide hex form so the
    // directory-vs-digest comparison never false-positives on types.
    val dirShard = lpad(col("shard").cast("string"), nibbles, "0")
    spark.read.parquet(outDir)
      .withColumn("shard", dirShard)
      .withColumn("_f", col("_metadata.file_path"))
      .withColumn("_ri", col("_metadata.row_index"))
      .withColumn("_prev", lag(col("shuffle_key"), 1).over(perFile))
      .filter(assert_true(
        col("shard") === col("shuffle_key").substr(lit(1), lit(nibbles)) &&
          col("shuffle_key") === md5(id.cast("string")) &&
          (col("_prev").isNull || col("_prev") <= col("shuffle_key")),
        concat(lit("ShardedSink read-back contract violated in file "),
          col("_f"))).isNull)
      .drop("_f", "_ri", "_prev")
  }
}
