package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle-salted self-join for blocked pair generation.
  *
  * Every blocked pair operator (token-set Jaccard, sign-bucket cosine,
  * any "score all pairs within a block" shape) shares a failure mode at
  * scale: the blocking key is LOW cardinality (tens of language×length
  * blocks, 2^nbits sign buckets), so a plain block-equi self-join hashes
  * each block to one shuffle partition and the biggest block's quadratic
  * pair scan runs single-threaded — measured 211 s for q45 at sf1, where
  * one block held ~19k docs (~176M candidate pairs) against only 10
  * join-key values.
  *
  * The classic fix (e.g. Okcan & Riedewald, "Processing Theta-Joins
  * using MapReduce", SIGMOD 2011): split each block's rows into `chunks`
  * uniform sub-chunks by id hash and emit one join task per (ca <= cb)
  * chunk pair. A row in chunk c is replicated to tasks (c, cb >= c) on
  * the left and (ca <= c, c) on the right, so a block spreads over
  * chunks*(chunks+1)/2 tasks at a shuffle-replication cost of ~chunks/2
  * copies per row. Exact — every in-block pair appears exactly once: a
  * cross-chunk pair {x,y} only matches the (chunk(x), chunk(y))
  * orientation with chunk keys ascending, and a same-chunk pair is
  * ordered by the caller's id column via [[orderedOnce]].
  *
  * The explicit fixed-count repartition on the task key is load-bearing:
  * the shuffle BYTES are tiny while the work per partition is quadratic
  * in its chunk sizes, so AQE's byte-based partition coalescing — and,
  * on a single-file input, the scan's own 1-split parallelism — would
  * otherwise funnel the whole pair scan into one or two threads. A
  * user-specified repartition count is exempt from AQE coalescing,
  * which is exactly the contract needed: task count is chosen by the
  * pair-work model (blocks × chunk pairs), not by shuffle volume.
  */
object TrianglePairs {

  /** Salted `(a, b, keyCond)` for a blocked self-pair join over `rows`.
    *
    * `a` carries `__chunk`/`__cb`, `b` carries `__chunk`/`__ca`;
    * `keyCond` equates the caller's `blockCols` plus the chunk keys.
    * Callers add their own pair predicate (size-ratio prefilter,
    * threshold, …) AND [[orderedOnce]] of their id columns, and should
    * emit ids with least/greatest — within a chunk pair the two sides
    * arrive in arbitrary id order.
    */
  def salted(rows: DataFrame, idCol: String, blockCols: Seq[String],
             chunks: Int): (DataFrame, DataFrame, Column) = {
    require(chunks >= 1, "chunks must be >= 1")
    val chunked = rows.withColumn("__chunk",
      pmod(xxhash64(col(idCol)), lit(chunks)).cast("int"))
    val shuffleParts = rows.sparkSession.sessionState.conf.numShufflePartitions
    val a = chunked
      .withColumn("__cb", explode(sequence(col("__chunk"), lit(chunks - 1))))
      .repartition(shuffleParts,
        (blockCols.map(col) :+ col("__chunk") :+ col("__cb")): _*)
      .as("a")
    val b = chunked
      .withColumn("__ca", explode(sequence(lit(0), col("__chunk"))))
      .as("b")
    val keyCond = (blockCols.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.__chunk") === col("b.__ca")) :+
      (col("a.__cb") === col("b.__chunk"))).reduce(_ && _)
    (a, b, keyCond)
  }

  /** Pair-uniqueness predicate: cross-chunk pairs already match exactly
    * one chunk orientation, same-chunk pairs order by the id columns.
    */
  def orderedOnce(aId: Column, bId: Column): Column =
    col("a.__chunk") =!= col("b.__chunk") || aId < bId

  /** [[salted]] plus a numeric ADJACENCY bucket in the equi key: side
    * `a` carries `__bkt = bucket`, side `b` probes `{__bkt-1, __bkt,
    * __bkt+1}`, so the hash/sort-merge join only ever ENUMERATES pairs
    * whose buckets differ by at most one — non-adjacent candidates are
    * skipped by the join's key hashing instead of being generated and
    * then killed by a predicate. Exact whenever the caller's pair
    * predicate implies a bounded bucket difference: e.g. Jaccard >= t
    * bounds the token-count ratio by t, so floor(log(n)/log(1/t))
    * buckets of qualifying pairs differ by <= 1 (pinned exhaustively in
    * TrianglePairsSpec). Cost: 3x replication of the (compact,
    * un-repartitioned) `b` side; a blocked pair scan is quadratic in
    * candidates, so trading x3 linear shuffle rows for a multiplicative
    * candidate cut is the right side of the inequality at any scale.
    *
    * Pair uniqueness is unchanged: the chunk-triangle fixes each
    * pair's a/b orientation (same-chunk pairs via [[orderedOnce]]),
    * and within an orientation the three probe values are distinct,
    * so a pair matches exactly one (`a.__bkt`, `b.__probe`) key.
    */
  def saltedAdjacent(rows: DataFrame, idCol: String, blockCols: Seq[String],
                     bucket: Column, chunks: Int)
      : (DataFrame, DataFrame, Column) = {
    require(chunks >= 1, "chunks must be >= 1")
    val chunked = rows
      .withColumn("__bkt", bucket.cast("long"))
      .withColumn("__chunk",
        pmod(xxhash64(col(idCol)), lit(chunks)).cast("int"))
    val shuffleParts = rows.sparkSession.sessionState.conf.numShufflePartitions
    val a = chunked
      .withColumn("__cb", explode(sequence(col("__chunk"), lit(chunks - 1))))
      .repartition(shuffleParts,
        (blockCols.map(col) :+ col("__bkt") :+ col("__chunk") :+ col("__cb")): _*)
      .as("a")
    val b = chunked
      .withColumn("__ca", explode(sequence(lit(0), col("__chunk"))))
      .withColumn("__probe", explode(array(
        col("__bkt") - 1, col("__bkt"), col("__bkt") + 1)))
      .as("b")
    val keyCond = (blockCols.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.__bkt") === col("b.__probe")) :+
      (col("a.__chunk") === col("b.__ca")) :+
      (col("a.__cb") === col("b.__chunk"))).reduce(_ && _)
    (a, b, keyCond)
  }
}
