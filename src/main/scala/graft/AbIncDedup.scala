package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B for the q109 incremental-dedup production shape: probe a
  * MATERIALIZED corpus bucket index (writeBucketIndex once, read per
  * batch) vs recompute the corpus's banded buckets on every batch
  * (the self-contained form the oracled query uses). Also times the
  * one-off index build, so the break-even batch count is explicit.
  *
  *   sbt "runMain graft.AbIncDedup /root/repo/testdata/sf1 [reps=5]"
  */
object AbIncDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, dir, "documents")
    val base = d.filter(col("doc_id") % 10 =!= 0)
    val delta = d.filter(col("doc_id") % 10 === 0)
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ab_bkidx").getAbsolutePath

    def time(f: () => Long): (Long, Seq[Double]) = {
      var n = 0L
      val ts = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        n = f()
        (System.nanoTime() - t0) / 1e9
      }
      (n, ts.drop(1).sorted)
    }

    // action that touches EVERY verdict column: a bare count() lets
    // Catalyst eliminate the 1:<=1 left joins (and with them the whole
    // base-bucket pipeline), which silently times an empty plan
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(col("doc_id")
          + coalesce(col("base_match"), lit(0L))
          + coalesce(col("delta_match"), lit(0L))
          + when(col("is_new"), lit(1L)).otherwise(lit(0L))))
        .collect()(0).getLong(0)

    val tIdx0 = System.nanoTime()
    Dedup.writeBucketIndex(base, col("doc_id"), col("text"), 128, 32, idxPath)
    val idxBuild = (System.nanoTime() - tIdx0) / 1e9

    val (nIdx, tIdx) = time(() =>
      checksum(Dedup.incrementalDedupIndexed(
        Dedup.readBucketIndex(spark, idxPath),
        delta, col("doc_id"), col("text"), 128, 32)))
    val (nRe, tRe) = time(() =>
      checksum(Dedup.incrementalDedup(base, delta,
        col("doc_id"), col("text"), 128, 32)))
    require(nIdx == nRe, s"verdict checksums diverge: $nIdx vs $nRe")

    // isolate the traded quantity: scanning the materialized index
    // rows vs recomputing them from corpus text
    val (nBk, tScan) = time(() =>
      Dedup.readBucketIndex(spark, idxPath).count())
    val (nBk2, tComp) = time(() =>
      Dedup.bandedBuckets(base, col("doc_id"), col("text"), 128, 32).count())
    require(nBk == nBk2, s"bucket counts diverge: $nBk vs $nBk2")

    def stats(ts: Seq[Double]) =
      f"min=${ts.head}%6.2f med=${ts(ts.size / 2)}%6.2f max=${ts.last}%6.2f"
    println(s"# q109 index A/B @ $dir ($reps reps, $nIdx verdict rows)")
    println(f"index build (once)   $idxBuild%6.2f s")
    println(s"probe-only (indexed) ${stats(tIdx)}")
    println(s"recompute-per-batch  ${stats(tRe)}")
    println(s"index scan only      ${stats(tScan)}  ($nBk bucket rows)")
    println(s"bucket compute only  ${stats(tComp)}")
    spark.stop()
  }
}
