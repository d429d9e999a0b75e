package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B for the q126 incremental-containment production shape: probe a
  * MATERIALIZED rarity-prefix postings index (writeContainmentIndex
  * once, read per batch) vs the only alternative a batch user has —
  * re-running all-pairs [[Dedup.containmentPairs]] over corpus∪batch,
  * whose cost is Θ(n²/V) by problem structure (PLANS.md r19). The
  * one-off index build is timed too, so the break-even batch count is
  * explicit. Verdicts are cross-checked: the probe's pair set must
  * checksum-equal the batch form restricted to batch×corpus pairs.
  *
  * Run on the REALISTIC-vocab fixtures (testdata/realdocs_sf*) — the
  * synthetic 31-word vocab makes exact containment structurally
  * quadratic in a way no index can fix (same caveat as ProfQ115).
  *
  *   sbt "runMain graft.AbIncContainment /root/repo/testdata/realdocs_sf1 [reps=3] [t=0.9] [fixedBatchMax=0]"
  *
  * `fixedBatchMax` > 0 pins the batch to doc_id % 10 == 0 AND
  * doc_id < fixedBatchMax — the SAME batch at every scale point, so
  * the probe arm's growth across sf1/sf3 measures per-batch cost vs
  * CORPUS size alone (the linearity claim), not batch×corpus growth.
  */
object AbIncContainment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/realdocs_sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.9
    val fixedMax = if (args.length > 3) args(3).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, dir, "documents")
    def isBatch(c: org.apache.spark.sql.Column) =
      if (fixedMax > 0) c % 10 === 0 && c < fixedMax else c % 10 === 0
    val corpus = d.filter(!isBatch(col("doc_id")))
    val batch = d.filter(isBatch(col("doc_id")))
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ab_cidx_${dir.hashCode.toHexString}").getAbsolutePath

    // pair-set checksum over every output column (a bare count would
    // let a wrong containment value slip through the verdict equality)
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("doc_small") + col("doc_big")
          + round(col("containment") * 1e6).cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def time[T](f: () => T): (T, Seq[Double]) = {
      var v: Option[T] = None
      val ts = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        v = Some(f())
        System.gc() // let the ContextCleaner drop finished-job shuffle
                    // files before the next rep (ProfQ115's r19 lesson)
        (System.nanoTime() - t0) / 1e9
      }
      (v.get, ts.drop(1).sorted)
    }

    val tIdx0 = System.nanoTime()
    Dedup.writeContainmentIndex(corpus, col("doc_id"), col("text"), idxPath)
    val idxBuild = (System.nanoTime() - tIdx0) / 1e9
    val idx = Dedup.readContainmentIndex(spark, idxPath)

    val (csProbe, tProbe) = time(() =>
      checksum(Dedup.containmentProbeIncremental(
        idx, batch, col("doc_id"), col("text"), t)))
    // arm B: the batch user's only option — all-pairs over corpus∪batch
    // (timed in full; the verdict compare restricts to cross pairs)
    val (csBatch, tBatch) = time(() =>
      checksum(Dedup.containmentPairs(d, col("doc_id"), col("text"), t)
        .filter(isBatch(col("doc_small")) =!= isBatch(col("doc_big")))))
    require(csProbe == csBatch,
      s"verdict checksums diverge: $csProbe vs $csBatch")

    def stats(ts: Seq[Double]) =
      f"min=${ts.head}%7.2f med=${ts(ts.size / 2)}%7.2f max=${ts.last}%7.2f"
    println(s"# q126 incremental containment A/B @ $dir " +
      s"(t=$t, $reps reps, ${csProbe._1} cross pairs)")
    println(f"index build (once)      $idxBuild%7.2f s")
    println(s"probe-only (indexed)    ${stats(tProbe)}")
    println(s"all-pairs corpus∪batch  ${stats(tBatch)}")
    spark.stop()
  }
}
