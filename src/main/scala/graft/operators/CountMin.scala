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
  * Scale shape (100 TB): ONE pass over the occurrences — a map-side
  * combinable groupBy collapsing them to (key, exact) — and every
  * downstream step runs on that collapsed universe. The grid cell for
  * (row, bucket) is the SUM of the exact counts of the keys hashing
  * there, identical to counting occurrences directly (r21: the former
  * two-scan form paid a second full pass plus d md5s per OCCURRENCE
  * just to rebuild what the key counts already contain; summing
  * per-key counts moves the d-way explode and the md5s to the
  * distinct-key table). The candidate keys then join the d×w grid
  * (AQE broadcasts it: ≤ d·w rows of two ints + a long, a few hundred
  * KB at any corpus size) and take min over rows. Candidate
  * ENUMERATION still requires the distinct keys — that is inherent to
  * offline heavy hitters (a streaming heap is the alternative); what
  * CM buys at scale is that the heavy per-occurrence aggregation
  * state is fixed-size. The key-count subtree feeds both the grid and
  * the candidate side; the plan reuses its one exchange, so the whole
  * operator is one occurrence scan and two bounded exchanges.
  */
object CountMin {

  /** The d×w grid over one key per input row (callers pre-explode).
    * Output: (row, bucket, cnt) — at most depth×width rows. Null keys
    * are ignored (md5(null) is null, so a null key has no bucket; it
    * must not silently corrupt a (row, null) cell — r20 advisor).
    */
  def sketch(keys: DataFrame, key: Column, width: Int,
             depth: Int): DataFrame = {
    requireDials(width, depth)
    keys
      .filter(key.isNotNull)
      .select(explode(rowBuckets(key, width, depth)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def requireDials(width: Int, depth: Int): Unit = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1,4] (8 hex chars per row of one md5), got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
  }

  /** All depth (row, bucket) pairs of a key from ONE md5 evaluation:
    * row j's bucket is an independent 32-bit slice of the same digest,
    * so the digest is computed once and sliced d times (the per-j
    * `bucketOf` form re-ran the md5 for every row).
    */
  private def rowBuckets(key: Column, width: Int, depth: Int): Column = {
    val digest = md5(key.cast("string"))
    array((0 until depth).map(j =>
      struct(lit(j).as("row"),
        pmod(conv(substring(digest, 1 + 8 * j, 8), 16, 10)
          .cast("bigint"), lit(width.toLong)).as("bucket"))): _*)
  }

  /** Top-k keys by count-min ESTIMATE (ties by key), with the exact
    * count attached so the over-count is visible in the output
    * instead of hidden in the sketch: one row per winner —
    * `key, est, exact` with `est ≥ exact` always. The occurrence
    * stream collapses to (key, exact) ONCE; the grid is the per-cell
    * SUM of those counts (bit-identical to counting occurrences — a
    * cell's occurrences are exactly the multiset union of its keys'),
    * so buckets are computed per distinct key and the one key-count
    * exchange feeds both the grid and the candidate side (reused in
    * the plan, pinned in PlansSpec).
    */
  def heavyHitters(df: DataFrame, key: Column, width: Int, depth: Int,
                   k: Int): DataFrame = {
    requireDials(width, depth)
    val keyCounts = df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("exact"))
    val grid = keyCounts
      .select(col("exact"),
        explode(rowBuckets(col("key"), width, depth)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum(col("exact")).as("cnt"))
    keyCounts
      .select(col("key"), col("exact"),
        explode(rowBuckets(col("key"), width, depth)).as("rb"))
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
