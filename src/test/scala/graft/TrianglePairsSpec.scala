package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TrianglePairs}

/** Pins the two properties `TrianglePairs.saltedAdjacent` rests on:
  *
  *  1. COVERAGE of the log-bucket adjacency key: for Jaccard threshold
  *     t, a qualifying pair's token counts satisfy min/max >= t, and
  *     the blocking assumes their floor(log(n)/log(1/t)) buckets then
  *     differ by at most 1. In real arithmetic that's a theorem; in
  *     floating point a size sitting exactly on a bucket boundary
  *     (e.g. sizes 4 and 5 at t = 0.8, where 5/4 is exactly the bucket
  *     base) could conceivably straddle two boundaries. The property
  *     is checked EXHAUSTIVELY through Spark's own expression
  *     evaluation for every size up to 10M against its largest
  *     admissible partner floor(n/t) — if this ever fails, the equi
  *     key would silently DROP a qualifying pair, which is exactly the
  *     failure mode an audit should catch loudly.
  *
  *  2. EXACTNESS of the salted pair enumeration: the chunk triangle +
  *     probe explosion must yield every qualifying pair exactly once,
  *     including pairs at the threshold boundary that cross a bucket
  *     edge, and pairs landing in the same chunk.
  */
class TrianglePairsSpec extends SparkSpec {

  test("adjacency buckets cover every ratio-qualifying size pair (t=0.8, exhaustive to 10M)") {
    val t = 0.8
    def bucket(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")) / math.log(1.0 / t))
    // largest admissible partner of size n at threshold t: floor(n/t)
    val dropped = spark.range(1, 10_000_000L)
      .select(col("id").as("n"),
        floor(col("id").cast("double") / t).cast("long").as("m"))
      .filter(bucket(col("m")) > bucket(col("n")) + 1)
      .count()
    assert(dropped === 0L)
  }

  test("saltedAdjacent yields each qualifying pair exactly once, incl. bucket-boundary sizes") {
    val rows = Seq(
      (1L, "a b c d"),       // 4 distinct tokens — bucket 6 at t=0.8
      (2L, "a b c d e"),     // 5 distinct tokens — bucket 7: j(1,2)=4/5 = t exactly
      (3L, "a b c d e"),     // dup of 2: j(2,3)=1.0, j(1,3)=0.8
      (4L, "x y z"),         // shares nothing
      (5L, "a b"),           // ratio 2/4 = 0.5 vs doc 1 — pruned
      (6L, " "))             // empty text: 0-token edge must not crash
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
        blockKeys = Seq(lit(1)), threshold = 0.8, chunks = 4)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq === Seq((1L, 2L, 0.8), (1L, 3L, 0.8), (2L, 3L, 1.0)))
  }

  test("saltedAdjacent probe triple keeps chunk-pair uniqueness under many chunks") {
    // 40 identical docs: every one of the 780 pairs qualifies at j=1.0;
    // any double-enumeration (probe x chunk interaction) would inflate
    // the count, any dropped chunk orientation would deflate it.
    val rows = (1L to 40L).map(i => (i, "t u v w x y z"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val n = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
        blockKeys = Seq(lit(1)), threshold = 0.9, chunks = 7).count()
    assert(n === 40L * 39 / 2)
  }
}
