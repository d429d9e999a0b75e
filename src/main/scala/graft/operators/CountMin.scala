package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) heavy hitters —
  * the bounded-state sibling of the exact top-k frequency pass: the
  * COUNT state is a d×w grid regardless of key cardinality, where the
  * exact form's shuffle carries every distinct key. Like the engine's
  * KMV and bloom operators, the sketch is DETERMINISTIC and
  * engine-neutral — row j's bucket for a key is
  * `md5(key)[8j..8j+8) mod w` — so a DuckDB oracle replays the grid,
  * the estimates, and the over-count bit-for-bit; nothing is
  * rows-only gated.
  *
  * Estimate law (pinned in OperatorsSpec): `est ≥ exact` for every
  * key (each grid cell counts the key's own occurrences plus its
  * bucket collisions — CM never under-counts), and est is
  * non-increasing in `depth` (more independent rows can only lower
  * the min).
  *
  * Scale shape (100 TB): one pass over the keys exploded ×d (map-side
  * combinable groupBy on (row, bucket) — the shuffle carries at most
  * d·w counted cells per map task, NOT the key universe), then the
  * candidate keys join the d×w grid (AQE broadcasts it: ≤ d·w rows of
  * two ints + a long, a few hundred KB at any corpus size) and take
  * min over rows. Candidate ENUMERATION still requires the distinct
  * keys — that is inherent to offline heavy hitters (a streaming heap
  * is the alternative); what CM buys at scale is that the heavy
  * per-occurrence aggregation state is fixed-size. The exact counts
  * ride the SAME shuffle candidate enumeration already pays — a
  * map-combined groupBy carries each distinct key once with an
  * 8-byte count attached, byte-identical in volume to a bare
  * distinct — so the whole operator is two scans and two bounded
  * exchanges, never a third pass over the occurrences.
  */
object CountMin {

  /** The d×w grid over one key per input row (callers pre-explode).
    * Output: (row, bucket, cnt) — at most depth×width rows.
    */
  def sketch(keys: DataFrame, key: Column, width: Int,
             depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1,4] (8 hex chars per row of one md5), got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    keys
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), bucketOf(key, j, width).as("bucket"))
      ): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Row-j bucket of a key: an independent 32-bit slice of its md5. */
  private def bucketOf(key: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1 + 8 * j, 8), 16, 10)
      .cast("bigint"), lit(width.toLong))

  /** Top-k keys by count-min ESTIMATE (ties by key), with the exact
    * count attached so the over-count is visible in the output
    * instead of hidden in the sketch: one row per winner —
    * `key, est, exact` with `est ≥ exact` always. Buckets are
    * recomputed from the key AFTER the candidate shuffle (they are a
    * pure function of the key), so the exchange carries keys+counts
    * only and the grid join runs over the already-collapsed universe.
    */
  def heavyHitters(df: DataFrame, key: Column, width: Int, depth: Int,
                   k: Int): DataFrame = {
    val keys = df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
    val grid = sketch(keys, col("key"), width, depth)
    keys
      .groupBy(col("key"))
      .agg(count(lit(1)).as("exact"))
      .select(col("key"), col("exact"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("row"),
            bucketOf(col("key"), j, width).as("bucket"))): _*)).as("rb"))
      .select(col("key"), col("exact"), col("rb.row").as("row"),
        col("rb.bucket").as("bucket"))
      .join(grid, Seq("row", "bucket"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
      .select(col("key"), col("est"), col("exact"))
      .orderBy(col("est").desc, col("key"))
  }
}
