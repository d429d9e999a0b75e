package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** A/B for the q122 incremental-ANN production shape: probe a
  * MATERIALIZED list_id-partitioned IVF index (writeIvfIndex once,
  * dynamically partition-pruned reads per batch) vs rebuild-and-scan
  * per batch (the self-contained form q54 uses: k-means + full-corpus
  * assignment + probe). Also times the one-off index build and the
  * bytes actually read per probe, so the break-even batch count and
  * the pruning win are both explicit.
  *
  *   sbt "runMain graft.AbIvfProbe /root/repo/testdata/sf1 [reps=5]"
  */
object AbIvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ab_ivfidx").getAbsolutePath

    def time(f: () => Long): (Long, Seq[Double]) = {
      var n = 0L
      val ts = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        n = f()
        (System.nanoTime() - t0) / 1e9
      }
      (n, ts.drop(1).sorted)
    }

    // action that touches every output column, so Catalyst can't
    // prune the scoring away under a bare count()
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(col("query_id") + col("neighbor_id")
          + col("centroid_id") + (col("cos") * 1e6).cast("long")
          + col("rank")))
        .collect()(0).getLong(0)

    // centroids are part of BOTH arms' semantics; the inline arm
    // retrains them per batch, the indexed arm trains once at build
    val tc0 = System.nanoTime()
    val centroids = Similarity.trainCentroids(
      e, "vec_id", "embedding", k = 8, iters = 3)
    val tTrain = (System.nanoTime() - tc0) / 1e9
    val ti0 = System.nanoTime()
    Similarity.writeIvfIndex(e, "vec_id", "embedding", centroids, idxPath)
    val tWrite = (System.nanoTime() - ti0) / 1e9

    val (nIdx, tProbe) = time(() =>
      checksum(Similarity.ivfProbeIndexed(
        Similarity.readIvfIndex(spark, idxPath), queries,
        "vec_id", "embedding", k = 5, centroids = centroids, nprobe = 2)))
    val (nInl, tInline) = time(() => {
      val c = Similarity.trainCentroids(
        e, "vec_id", "embedding", k = 8, iters = 3)
      checksum(Similarity.ivfTopK(queries, e, "vec_id", "embedding",
        k = 5, centroids = c, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          col("centroid_id").cast("long").as("centroid_id"),
          col("cos"), col("rank")))
    })
    require(nIdx == nInl, s"verdict checksums diverge: $nIdx vs $nInl")

    def stats(ts: Seq[Double]) =
      f"min=${ts.head}%6.2f med=${ts(ts.size / 2)}%6.2f max=${ts.last}%6.2f"
    println(s"# q122 IVF index A/B @ $dir ($reps reps, $nIdx checksum)")
    println(f"k-means train (once)   $tTrain%6.2f s")
    println(f"index build+write      $tWrite%6.2f s")
    println(s"probe-only (indexed)   ${stats(tProbe)}")
    println(s"rebuild-per-batch      ${stats(tInline)}")
    spark.stop()
  }
}
