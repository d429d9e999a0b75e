package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.signBucket
import graft.operators.{BlockDials, Similarity}

/** A/B for capped near-neighbor mining: q120's sign-bucket blocking
  * (cosineTopKBlocked at the [[BlockDials.signBits]] dial) vs q124's
  * IVF-indexed blocking (cosineTopKIndexed over a sample-trained
  * materialized index at the [[BlockDials.ivfLists]] dial).
  *
  * Reports, per arm: wall time (indexed arm split into train / write /
  * mine — build is the amortized one-off), CANDIDATE VOLUME (the
  * number the scale exponent follows: Σ bucket² for sign buckets,
  * Σ srcList×probeList over the adjacency for IVF), output rows, and
  * recall against exact threshold-top-k ground truth (O(n²) — computed
  * only when `truth=1`; at sfs where n² is not affordable the arms are
  * compared to each other instead).
  *
  *   sbt "runMain graft.AbTopKIndexed /root/repo/testdata/sf1 [reps=3] [truth=1]"
  */
object AbTopKIndexed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val withTruth = if (args.length > 2) args(2).toInt == 1 else true
    val nprobe = if (args.length > 3) args(3).toInt else 2
    // experimental cap-multiplier override (dial study only; the
    // shipped dial is BlockDials.ivfListCap's 2x average)
    val capMult = if (args.length > 4) Some(args(4).toDouble) else None
    // experimental probe in-degree cap (hub mitigation study, r19
    // finding 2; 0 = shipped uncapped adjacency)
    val inDegreeCap = if (args.length > 5) args(5).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val K = 5
    val T = 0.45

    def time(f: () => Long): (Long, Double) = {
      var out = 0L
      val ts = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        out = f()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (out, ts(ts.size / 2))
    }
    // action touching every output column, so Catalyst can't prune
    // the scoring under a bare count()
    def checksum(df: DataFrame): Long =
      df.select(count(lit(1)) +
          sum(col("doc_id") + col("neighbor_id")
            + (col("cos") * 1e6).cast("long") + col("rank")))
        .collect()(0).getLong(0)
    def outPairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet

    // ---- arm A: sign-bucket blocked (q120's exact form) ----
    val nb = BlockDials.signBits(n)
    def armA() = Similarity.cosineTopKBlocked(
      e, "vec_id", "embedding", K, T, nb)
    val (_, tA) = time(() => checksum(armA()))
    val candA = e.groupBy(signBucket(col("embedding"), nb).as("b"))
      .count().agg(sum(col("count") * col("count")))
      .collect()(0).getLong(0)

    // ---- arm B: IVF-indexed (q124's exact form) ----
    val c = BlockDials.ivfLists(n)
    val smp = math.min(n, 50L * c).toInt
    val t0 = System.nanoTime()
    val centroids = Similarity.trainCentroids(
      e.orderBy(col("vec_id")).limit(smp), "vec_id", "embedding",
      k = c, iters = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9
    // keyed by the input dir: two concurrent A/B runs (sf1 vs sf10 on
    // one host) must never overwrite each other's index mid-measure
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ab_topk_idx_${dir.hashCode.toHexString}").getAbsolutePath
    val t1 = System.nanoTime()
    val cap = capMult match {
      // clamp before .toInt — Long→Int truncation wraps at giant n (r19 advice)
      case Some(m) => math.min(Int.MaxValue.toLong,
        math.max(1L, math.ceil(m * math.ceil(n.toDouble / c)).toLong)).toInt
      case None    => BlockDials.ivfListCap(n, c)
    }
    Similarity.writeIvfIndex(e, "vec_id", "embedding", centroids, idxPath,
      listCap = cap)
    val tWrite = (System.nanoTime() - t1) / 1e9
    val index = Similarity.readIvfIndex(spark, idxPath)
    def armB() = Similarity.cosineTopKIndexed(
      index, centroids, K, T, nprobe = nprobe, inDegreeCap = inDegreeCap)
    val (_, tB) = time(() => checksum(armB()))
    // candidate volume: Σ over the operator's OWN symmetric-closure
    // UNORDERED list pairs of |la|×|lb| (same-list pairs count
    // n·(n−1)/2 — each scored once); probeAdjacency is the operator's
    // adjacency, so this counts what the miner scores by construction
    val sizes = index.groupBy(col("list_id").cast("long").as("lid"))
      .count()
    val lp = Similarity.probeAdjacency(centroids, nprobe,
      inDegreeCap = inDegreeCap)
    val candB = lp
      .join(sizes.withColumnRenamed("lid", "la")
        .withColumnRenamed("count", "ns"), Seq("la"))
      .join(sizes.withColumnRenamed("lid", "lb")
        .withColumnRenamed("count", "nd"), Seq("lb"))
      .agg(sum(when(col("la") === col("lb"),
          (col("ns") * (col("ns") - 1) / 2).cast("long"))
        .otherwise(col("ns") * col("nd"))))
      .collect()(0).getLong(0)

    // ---- recall ----
    val pairsA = outPairs(armA())
    val pairsB = outPairs(armB())
    val recallJson =
      if (withTruth) {
        // exact ground truth: O(n²) threshold pairs, per-doc top-K
        val ex = Similarity.cosinePairs(e, "vec_id", "embedding", T)
        val directed = ex.select(col("id_a").as("d2"), col("id_b").as("n2"),
            col("cos"))
          .union(ex.select(col("id_b"), col("id_a"), col("cos")))
        val wt = Window.partitionBy(col("d2"))
          .orderBy(col("cos").desc, col("n2"))
        val truth = directed.withColumn("r", row_number().over(wt))
          .filter(col("r") <= K).select(col("d2"), col("n2"))
          .as[(Long, Long)].collect().toSet
        val rA = pairsA.intersect(truth).size.toDouble / math.max(1, truth.size)
        val rB = pairsB.intersect(truth).size.toDouble / math.max(1, truth.size)
        f""""truth_pairs":${truth.size},"recall_blocked":$rA%.4f,"recall_indexed":$rB%.4f"""
      } else {
        val ab = pairsA.intersect(pairsB).size
        f""""overlap_of_blocked":${ab.toDouble / math.max(1, pairsA.size)}%.4f,"overlap_of_indexed":${ab.toDouble / math.max(1, pairsB.size)}%.4f"""
      }

    println(f"""{"ab":"topk_indexed","sf":"$dir","n":$n,"reps":$reps,""" +
      f""""blocked":{"sec":$tA%.3f,"rows":${pairsA.size},"cands":$candA,"nbits":$nb},""" +
      f""""indexed":{"train_sec":$tTrain%.3f,"write_sec":$tWrite%.3f,"mine_sec":$tB%.3f,""" +
      f""""rows":${pairsB.size},"cands":$candB,"lists":$c,"cap":$cap,"nprobe":$nprobe,"in_degree_cap":$inDegreeCap,"sample":$smp},""" +
      s"""$recallJson}""")
    spark.stop()
  }
}
