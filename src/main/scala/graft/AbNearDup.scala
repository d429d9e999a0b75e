package graft

import org.apache.spark.sql.functions._

import graft.operators.{BlockDials, Similarity}

/** A/B for the dedup DECISION path on the realistic clustered fixture
  * (tools/make_clustered_embeddings.py, which writes the planted
  * (dup, orig) ground truth alongside): q121's sign-bucket
  * `nearDupComponents` vs q125's IVF-indexed
  * `nearDupComponentsIndexed`, both at production dials.
  *
  * Reports, per arm: wall time (indexed split into build / decide),
  * component count, and PLANTED-PAIR RECALL — the fraction of planted
  * near-duplicates the decision actually merges (the number RecallSpec
  * gates at >= 0.95 on its in-process fixture; this main records it on
  * the committed generator's full-size output).
  *
  *   sbt "runMain graft.AbNearDup /root/repo/testdata/realemb_sf1"
  */
object AbNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/realemb_sf1")
    val nprobe = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val T = 0.45
    val planted = spark.read.parquet(s"$dir/planted_pairs.parquet")
      .select(col("dup_id"), col("orig_id"))
      .as[(Long, Long)].collect()

    def recall(comp: Map[Long, Long]): Double =
      planted.count { case (d, o) => comp(d) == comp(o) }
        .toDouble / math.max(1, planted.length)

    // ---- arm A: sign-bucket decision (q121's exact form) ----
    val nb = BlockDials.signBits(n)
    val tA0 = System.nanoTime()
    val compA = Similarity.nearDupComponents(e, "vec_id", "embedding",
        T, nb).as[(Long, Long)].collect().toMap
    val tA = (System.nanoTime() - tA0) / 1e9
    val rA = recall(compA)

    // ---- arm B: IVF-indexed decision (q125's exact form) ----
    val c = BlockDials.ivfLists(n)
    val smp = math.min(n, 50L * c).toInt
    val tB0 = System.nanoTime()
    val centroids = Similarity.trainCentroids(
      e.orderBy(col("vec_id")).limit(smp), "vec_id", "embedding",
      k = c, iters = 2)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ab_neardup_${dir.hashCode.toHexString}").getAbsolutePath
    Similarity.writeIvfIndex(e, "vec_id", "embedding", centroids, path)
    val tBuild = (System.nanoTime() - tB0) / 1e9
    val tB1 = System.nanoTime()
    val compB = Similarity.nearDupComponentsIndexed(
        Similarity.readIvfIndex(spark, path), centroids, T, nprobe)
      .as[(Long, Long)].collect().toMap
    val tDecide = (System.nanoTime() - tB1) / 1e9
    val rB = recall(compB)

    println(f"""{"ab":"near_dup_decision","sf":"$dir","n":$n,""" +
      f""""planted":${planted.length},""" +
      f""""blocked":{"sec":$tA%.3f,"nbits":$nb,""" +
      f""""components":${compA.values.toSet.size},"planted_recall":$rA%.4f},""" +
      f""""indexed":{"build_sec":$tBuild%.3f,"decide_sec":$tDecide%.3f,""" +
      f""""lists":$c,"nprobe":$nprobe,""" +
      f""""components":${compB.values.toSet.size},"planted_recall":$rB%.4f}}""")
    spark.stop()
  }
}
