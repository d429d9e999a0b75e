package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Dedup}

/** A/B + scale measurements for the two round-20 curation operators.
  *
  * **q128 bloom decontamination** vs exact [[Decontaminate.overlap]]
  * in the regime the bloom form exists for: a LARGE eval side (20 % of
  * the corpus stands in for a big benchmark suite). Reports both wall
  * times and — the actual claim — the size of what each form ships to
  * every task: exact must broadcast EVERY distinct eval gram digest
  * (32-byte md5 hex, grows linearly with the eval suite), bloom ships
  * the distinct set-bit table (8-byte ints, ≤ min(mBits, k·grams)
  * rows, hard-capped by mBits forever). Verdict cross-check: zero
  * per-doc false negatives (n_bloom_hits ≥ n_hits everywhere), and the
  * doc-level false-positive count is printed, not hidden.
  *
  * **q129 span dedup** linearity: [[Dedup.dupSpanStats]] timed at each
  * fixture — run on realdocs_sf1 then realdocs_sf3 (3× corpus) and
  * compare; the operator is one map-side-combinable count + a join
  * back, so time should grow ~linearly with corpus size (no pair
  * table, unlike every pairwise dedup in the family).
  *
  * Run on the REALISTIC-vocab fixtures: the synthetic 31-word vocab
  * caps the trigram space at 31³ ≈ 30 k grams, which would make the
  * exact form's broadcast artificially bounded too (the same caveat
  * every containment measurement carries — PLANS.md r19).
  *
  *   sbt "runMain graft.AbBloomSpan /root/repo/testdata/realdocs_sf1 [reps=3] [mBits=16777216]"
  */
object AbBloomSpan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/realdocs_sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val mBits = if (args.length > 2) args(2).toInt else 1 << 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val eval_ = d.filter(col("doc_id") % 5 === 0)

    require(reps >= 1, s"reps must be >= 1, got $reps")
    def time[T](f: () => T): (T, Seq[Double]) = {
      var v: Option[T] = None
      val ts = (0 to reps).map { _ =>
        // GC BEFORE the timed region (AbQ69's med() pattern): inside
        // it, every rep's wall time includes a full GC pause and the
        // recorded absolutes are inflated (r20 advisor)
        System.gc() // drop finished-job shuffle files between reps
        val t0 = System.nanoTime()
        v = Some(f())
        (System.nanoTime() - t0) / 1e9
      }
      (v.get, ts.drop(1).sorted)
    }
    def stats(ts: Seq[Double]) =
      f"min=${ts.head}%7.2f med=${ts(ts.size / 2)}%7.2f max=${ts.last}%7.2f"

    // ---- q128: exact vs bloom on a corpus-sized eval suite ---------
    val grams = graft.functions.expressions.ShingleMd5
      .shingleMd5(graft.functions.TextFunctions.tokens(col("text")), 3)
    val evalGramCount = eval_
      .select(explode(grams).as("g")).distinct().count()
    val bitCount = eval_ // what bloom actually ships (k=2 positions)
      .select(explode(grams).as("g"))
      .select(explode(array((0 until 2).map(j =>
        pmod(conv(substring(col("g"), 1 + 8 * j, 8), 16, 10)
          .cast("bigint"), lit(mBits.toLong))): _*)).as("bit"))
      .distinct().count()

    def sumHits(df: org.apache.spark.sql.DataFrame, hits: String,
                flag: String): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col(hits)),
        count(when(col(flag), lit(1)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2))
    }
    val (exactRes, tExact) = time(() => sumHits(
      Decontaminate.overlap(corpus, eval_, "doc_id", "text", 3),
      "n_hits", "contaminated"))
    val (bloomRes, tBloom) = time(() => sumHits(
      Decontaminate.bloomOverlap(corpus, eval_, "doc_id", "text", 3,
        mBits = mBits, numHashes = 2),
      "n_bloom_hits", "bloom_flagged"))
    // verdict: no per-doc false negative anywhere (untimed)
    val fn = Decontaminate.overlap(corpus, eval_, "doc_id", "text", 3)
      .select(col("doc_id"), col("n_hits"))
      .join(Decontaminate.bloomOverlap(corpus, eval_, "doc_id", "text",
        3, mBits = mBits, numHashes = 2)
        .select(col("doc_id"), col("n_bloom_hits")), "doc_id")
      .filter(col("n_bloom_hits") < col("n_hits")).count()
    require(fn == 0L, s"$fn docs with bloom false negatives")

    println(s"# q128 bloom-vs-exact decontamination @ $dir " +
      s"(eval = 20% of corpus, mBits=$mBits, k=2, $reps reps)")
    println(f"eval distinct grams (exact broadcasts, 32 B md5 hex) " +
      f"$evalGramCount%10d rows ~${evalGramCount * 32 / 1e6}%7.1f MB")
    println(f"bloom set-bit table (bloom broadcasts, 8 B ints)      " +
      f"$bitCount%10d rows ~${bitCount * 8 / 1e6}%7.1f MB " +
      f"(hard cap $mBits)")
    println(s"exact overlap   ${stats(tExact)}  " +
      s"(docs=${exactRes._1}, hits=${exactRes._2}, flagged=${exactRes._3})")
    println(s"bloom overlap   ${stats(tBloom)}  " +
      s"(docs=${bloomRes._1}, hits=${bloomRes._2}, flagged=${bloomRes._3})")
    println(s"doc-level false positives: ${bloomRes._3 - exactRes._3} " +
      s"of ${exactRes._1} (${fn} false negatives — must be 0)")

    // ---- q129: span-dedup wall time at this corpus size ------------
    def spanChecksum(): (Long, Long) = {
      val r = Dedup.dupSpanStats(d, col("doc_id"), col("text"), 8)
        .agg(sum(col("n_windows")), sum(col("n_dup_windows"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (spanRes, tSpan) = time(() => spanChecksum())
    println(s"# q129 dupSpanStats(w=8) @ $dir ($reps reps)")
    println(s"span stats      ${stats(tSpan)}  " +
      s"(windows=${spanRes._1}, dup=${spanRes._2})")
    spark.stop()
  }
}
