package graft

import org.apache.spark.sql.functions.{col, floor}

import graft.operators.{BlockDials, Dedup, Similarity}

/** Measures the size-derived blocking dials (BlockDials) for the two
  * candidate-volume operators, q45 (blocked token-set Jaccard) and
  * q57 (sign-bucket cosine): derived dial value, pair count, runtime —
  * and, where the ground truth is feasible, RECALL.
  *
  * Recall uses the blocking-only invariant (PropertySpec): a blocked
  * result is a SUBSET of the less-blocked one, so recall is a count
  * ratio, no pair-set join needed.
  *  - q45 truth = lang-only blocking (no length band): every
  *    same-language pair is compared. Feasible to sf3.
  *  - q57 truth = exact all-pairs cosine (cosinePairs). Feasible to
  *    sf1 (O(n²) dot products).
  *
  *   sbt "runMain graft.ScaleKnobs testdata/sf1 truth fixed"
  *     truth — also run the ground-truth variant (recall)
  *     fixed — also run round-14's fixed dials (width 500 / 4 bits)
  *     q45only — documents-only dir (e.g. the realistic-vocabulary
  *               fixture from tools/make_realistic_docs.py): skip q57
  */
object ScaleKnobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata/sf1")
    val withTruth = args.contains("truth")
    val withFixed = args.contains("fixed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Long): (Long, Double) = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val (nd, mx) = BlockDials.countAndMax(docs, col("n_chars"))
    val w = BlockDials.lengthBucketWidth(nd, mx)
    println(s"# q45 @ $sfDir: n=$nd max_chars=$mx -> auto width=$w " +
      s"(${math.ceil(nd / 1250.0).toLong} bands)")
    def jp(width: Int): Long = Dedup.jaccardPairs(docs, col("doc_id"),
        col("text"),
        blockKeys = Seq(col("lang"),
          floor(col("n_chars") / width.toDouble).cast("int")),
        threshold = 0.8).count()
    val (pa, ta) = timed(jp(w))
    println(f"q45 auto    width=$w%-7d pairs=$pa%12d  time=$ta%8.2f s")
    if (withFixed) {
      val (pf, tf) = timed(jp(500))
      println(f"q45 fixed   width=500     pairs=$pf%12d  time=$tf%8.2f s")
    }
    if (withTruth) {
      val (pt, tt) = timed(jp(Int.MaxValue / 2))
      println(f"q45 truth   lang-only     pairs=$pt%12d  time=$tt%8.2f s")
      println(f"q45 recall  auto=${pa.toDouble / math.max(1, pt)}%.4f")
    }

    if (args.contains("q45only")) { spark.stop(); return }
    val emb = Tables.load(spark, sfDir, "embeddings")
    val ne = emb.count()
    val nb = BlockDials.signBits(ne)
    println(s"# q57 @ $sfDir: n=$ne -> auto nbits=$nb (${1 << nb} buckets)")
    def cp(bits: Int): Long = Similarity
      .cosinePairsBlocked(emb, "vec_id", "embedding", 0.45, bits).count()
    val (qa, ua) = timed(cp(nb))
    println(f"q57 auto    nbits=$nb%-2d      pairs=$qa%12d  time=$ua%8.2f s")
    if (withFixed) {
      val (qf, uf) = timed(cp(4))
      println(f"q57 fixed   nbits=4       pairs=$qf%12d  time=$uf%8.2f s")
    }
    if (withTruth) {
      val (qt, ut) = timed(Similarity
        .cosinePairs(emb, "vec_id", "embedding", 0.45).count())
      println(f"q57 truth   exact         pairs=$qt%12d  time=$ut%8.2f s")
      println(f"q57 recall  auto=${qa.toDouble / math.max(1, qt)}%.4f")
    }
    spark.stop()
  }
}
