package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.CidFunctions._
import graft.operators.{PriorityDedup, RangeJoin}

/** Property-based checks from SURVEY.md §5's test plan: F1 idempotence,
  * F2 prefix-of-F1, W1 survivor invariants, U1+W1 row-count bounds,
  * J3 containment.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Drive a generator N times (scalatestplus isn't on the offline
    * classpath, so sampling is explicit). */
  private def forAllSamples[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
    }
  }

  private val codeGen: Gen[String] = for {
    letter <- Gen.alphaUpperChar
    digits <- Gen.choose(0, 99)
    dot <- Gen.oneOf("", f".$digits%02d".take(2))
    pad <- Gen.oneOf("", " ", "  ")
    lower <- Gen.oneOf(true, false)
  } yield {
    val s = f"$letter$digits%02d$dot"
    pad + (if (lower) s.toLowerCase else s) + pad
  }

  test("F1 normalizeCode is idempotent; F2 output is a prefix of F1 output") {
    forAllSamples(Gen.listOfN(30, codeGen)) { codes =>
      if (codes.nonEmpty) {
        val rows = codes.toDF("c").select(
          normalizeCode($"c").as("n1"),
          normalizeCode(normalizeCode($"c")).as("n2"),
          extractRootCategory($"c").as("root"))
          .collect()
        rows.foreach { r =>
          assert(r.getString(0) == r.getString(1)) // idempotent
          assert(r.getString(0).startsWith(r.getString(2))) // root is prefix
          assert(!r.getString(2).contains("."))
        }
      }
    }
  }

  test("W1: output keys distinct, survivor has max priority per key") {
    val rowGen = for {
      key <- Gen.choose(0, 8)
      fonte <- Gen.oneOf("Estruturada", "DATASUS")
      id <- Gen.choose(0, 1000)
    } yield (s"K$key", fonte, id)
    forAllSamples(Gen.listOfN(60, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("code", "fonte", "id")
        val out = PriorityDedup(df, Seq("code"),
            Seq($"fonte".desc, $"id".asc))
          .as[(String, String, Int)].collect()
        // keys distinct
        assert(out.map(_._1).distinct.length == out.length)
        // exactly the distinct input keys survive (U1+W1 count bound)
        assert(out.map(_._1).toSet == rows.map(_._1).toSet)
        // survivor carries the max fonte for its key
        val maxFonte = rows.groupBy(_._1).map { case (k, rs) =>
          k -> rs.map(_._2).max }
        out.foreach { case (k, f, _) => assert(f == maxFonte(k)) }
      }
    }
  }

  test("J3: every matched row is inside its matched range; " +
       "unmatched rows are outside every range") {
    val ranges = Seq(("A00", "A09", 0L), ("A20", "B50", 1L), ("C00", "C10", 2L))
      .toDF("lo", "hi", "ord")
    forAllSamples(Gen.listOfN(40, codeGen), n = 8) { codes =>
      if (codes.nonEmpty) {
        val items = codes.map(_.trim.toUpperCase).toDF("code")
        val out = RangeJoin.firstMatch(items, ranges, $"code", $"lo", $"hi",
            leftKey = Seq("code"), rangeOrder = $"ord")
          .select($"code", $"lo", $"hi")
          .collect()
        out.foreach { r =>
          val (code, lo, hi) = (r.getString(0), r.getString(1), r.getString(2))
          if (lo != null)
            assert(lo <= code && code <= hi)
          else {
            val inAny = Seq(("A00", "A09"), ("A20", "B50"), ("C00", "C10"))
              .exists { case (l, h) => l <= code && code <= h }
            assert(!inAny)
          }
        }
      }
    }
  }

  private val eventLogGen: Gen[List[(Long, String, Long, Long)]] =
    Gen.listOfN(40, for {
      user <- Gen.choose(1L, 4L)
      st <- Gen.oneOf("A", "B", "C")
      ts <- Gen.choose(0L, 50L)
      id <- Gen.choose(0L, 1000000L)
    } yield (user, st, ts, id)).map(_.distinctBy(_._4))

  test("Scd2: segments tile each key, n_events sum matches, no " +
       "adjacent segments share a state") {
    forAllSamples(eventLogGen, n = 10) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("user_id", "st", "ts", "event_id")
        val out = operators.Scd2
          .collapse(df, "user_id", "st", "ts", "event_id")
          .orderBy("user_id", "seg").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
            r.getLong(5)))
        // per key: counts add up to the log size
        val perKey = out.groupBy(_._1)
        for ((user, segs) <- perKey) {
          val ordered = segs.sortBy(_._2)
          assert(ordered.map(_._6).sum ==
            rows.count(_._1 == user))
          // valid_to == next valid_from, open-ended only on the last
          ordered.sliding(2).foreach {
            case Array(a, b) =>
              assert(a._5.contains(b._4))
              assert(a._3 != b._3) // adjacent segments differ in state
            case _ =>
          }
          assert(ordered.last._5.isEmpty)
        }
      }
    }
  }

  test("TrianglePairs: salted pair generation is exact — chunks=k " +
    "equals the chunks=1 plain block join for every k") {
    // random docs over a tiny vocab in few blocks, so in-block pairs
    // are dense and the chunk decomposition is exercised across block
    // boundaries, same-chunk pairs, and cross-chunk orientations
    val docGen = for {
      n <- Gen.choose(20, 60)
      words <- Gen.listOfN(n, Gen.listOfN(6,
        Gen.oneOf("a b c d e f g h i j".split(" ").toSeq)))
      blocks <- Gen.listOfN(n, Gen.choose(0, 2))
    } yield words.map(_.mkString(" ")).zip(blocks).zipWithIndex
      .map { case ((t, blk), i) => (i.toLong, t, blk) }
    forAllSamples(docGen, n = 5) { docs =>
      val df = docs.toDF("doc_id", "text", "blk")
      def pairs(chunks: Int) =
        graft.operators.Dedup.jaccardPairs(df, $"doc_id", $"text",
            Seq($"blk"), threshold = 0.5, chunks = chunks)
          .select("doc_a", "doc_b").collect().map(r =>
            (r.getLong(0), r.getLong(1))).toSet
      val plain = pairs(1)
      for (k <- Seq(3, 7)) {
        assert(pairs(k) == plain,
          s"chunks=$k pair set diverged from the unsalted join")
      }
    }
  }

  test("Decontaminate: n_hits <= n_grams; zero-overlap eval set flags nothing") {
    val textGen = Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    forAllSamples(Gen.listOfN(8, textGen), n = 8) { texts =>
      val corpus = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val disjointEval = Seq((99L, "xx yy zz xx yy")).toDF("doc_id", "text")
      val out = operators.Decontaminate
        .overlap(corpus, disjointEval, "doc_id", "text", 3).collect()
      assert(out.length == texts.size)
      out.foreach { r =>
        assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_grams"))
        assert(r.getAs[Long]("n_hits") == 0L) // disjoint vocab
        assert(!r.getAs[Boolean]("contaminated"))
      }
      // self-contamination: using the corpus as the eval set flags
      // every doc with at least one trigram
      val self = operators.Decontaminate
        .overlap(corpus, corpus, "doc_id", "text", 3).collect()
      self.foreach { r =>
        assert((r.getAs[Long]("n_grams") > 0L) ==
          r.getAs[Boolean]("contaminated"))
        if (r.getAs[Long]("n_grams") > 0L)
          assert(r.getAs[Long]("n_hits") == r.getAs[Long]("n_grams"))
      }
    }
  }

  test("bloomOverlap: never under-flags exact overlap, on random " +
      "corpora across the full dial grid") {
    val textGen = Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    val gen = Gen.zip(Gen.listOfN(8, textGen),
      Gen.oneOf(2, 16, 64, 65536), Gen.oneOf(1, 2, 4))
    forAllSamples(gen, n = 8) { case (texts, m, k) =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val corpus = df.filter($"doc_id" < 6)
      val eval_ = df.filter($"doc_id" >= 6)
      val exact = operators.Decontaminate
        .overlap(corpus, eval_, "doc_id", "text", 3)
        .select($"doc_id", $"n_grams", $"n_hits", $"contaminated")
      val bloom = operators.Decontaminate
        .bloomOverlap(corpus, eval_, "doc_id", "text", 3, m, k)
      val j = exact.join(
        bloom.select($"doc_id", $"n_grams".as("gb"),
          $"n_bloom_hits", $"bloom_flagged"), "doc_id").collect()
      assert(j.length == 6)
      j.foreach { r =>
        assert(r.getAs[Long]("n_grams") == r.getAs[Long]("gb"),
          s"gram accounting diverged at m=$m k=$k")
        assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_hits"),
          s"bloom under-counted at m=$m k=$k")
        if (r.getAs[Boolean]("contaminated"))
          assert(r.getAs[Boolean]("bloom_flagged"),
            s"bloom dropped a true flag at m=$m k=$k")
      }
    }
  }

  test("dupSpanStats equals a positional brute force on random corpora") {
    val textGen = Gen.choose(1, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
        .map(_.mkString(" ")))
    forAllSamples(Gen.listOfN(8, textGen), n = 8) { texts =>
      val W = 3
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = operators.Dedup
        .dupSpanStats(df, $"doc_id", $"text", W)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // independent recompute: sliding windows as plain strings, a
      // global multiset count, dup = positions whose window occurs >1
      val windows = texts.map(_.trim.split("\\s+").toSeq
        .sliding(W).filter(_.size == W).map(_.mkString(" ")).toSeq)
      val occ = windows.flatten.groupBy(identity).map {
        case (w, xs) => w -> xs.size
      }
      val want = windows.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.size.toLong, ws.count(occ(_) > 1).toLong)
      }
      assert(got.toSeq == want)
    }
  }

  test("CountMin estimates equal an independent md5-grid recompute; " +
      "est >= exact always") {
    val gen = Gen.zip(Gen.listOfN(60, Gen.choose(0, 25)),
      Gen.oneOf(2, 8, 64), Gen.oneOf(1, 2, 3))
    forAllSamples(gen, n = 8) { case (ints, w, d) =>
      val keys = ints.map(i => s"k$i")
      val df = keys.toDF("k")
      val got = operators.CountMin
        .heavyHitters(df, $"k", width = w, depth = d, k = 1000)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // independent recompute with java's own md5 (not Spark's)
      def bucket(key: String, j: Int): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (BigInt(hex.slice(8 * j, 8 * j + 8), 16) % w).toLong
      }
      val grid = keys.flatMap(key => (0 until d).map(j =>
        (j, bucket(key, j)))).groupBy(identity)
        .map { case (cell, xs) => cell -> xs.size.toLong }
      val exact = keys.groupBy(identity)
        .map { case (key, xs) => key -> xs.size.toLong }
      val want = exact.keys.toSeq.map { key =>
        val est = (0 until d).map(j => grid((j, bucket(key, j)))).min
        (key, est, exact(key))
      }.sortBy { case (key, est, _) => (-est, key) }
      assert(got == want, s"w=$w d=$d")
      got.foreach { case (key, est, ex) =>
        assert(est >= ex, s"under-count for $key at w=$w d=$d")
      }
    }
  }

  test("containmentPairs: prefix filter is exhaustive — equals brute " +
      "force on random corpora, thresholds, and vocabulary densities") {
    // The PPJoin both-prefix bound and the fp-safe prefix slack are
    // the correctness-critical pieces: a one-off bound error silently
    // DROPS qualifying pairs (the oracle would catch it at one
    // density; this sweeps densities and thresholds). Vocab size
    // drives density: tiny vocab => near-total containment, large
    // vocab => sparse.
    val docGen = for {
      vocab <- Gen.oneOf(5, 12, 60, 400)
      nDocs <- Gen.choose(20, 60)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 25)
        toks <- Gen.listOfN(len, Gen.choose(0, vocab - 1))
      } yield toks.map(t => s"w$t").mkString(" "))
    } yield docs
    forAllSamples(Gen.zip(docGen, Gen.oneOf(0.5, 0.8, 0.9, 1.0)), n = 8) {
      case (texts, t) =>
        val docs = texts.zipWithIndex
          .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
        val got = operators.Dedup
          .containmentPairs(docs, $"doc_id", $"text", t)
          .select($"doc_small", $"doc_big").as[(Long, Long)]
          .collect().toSet
        val toks = texts.zipWithIndex
          .map { case (s, i) => i.toLong -> s.split("\\s+").toSet }
        val brute = (for {
          (ia, sa) <- toks; (ib, sb) <- toks
          if sa.size < sb.size || (sa.size == sb.size && ia < ib)
          if sa.intersect(sb).size.toDouble / sa.size >= t
        } yield (ia, ib)).toSet
        assert(got == brute, s"t=$t vocabs=${texts.take(2)}")
    }
  }

  test("BlockDials formulas: pure, integer-exact, DuckDB-parity pinned") {
    import graft.operators.BlockDials
    // signBits values cross-checked against the oracle's
    // GREATEST(1, LENGTH(BIN(CEIL(n/750.0)::BIGINT - 1))) in DuckDB
    // 1.0.0 (recorded in PLANS.md): the two must stay in lockstep or
    // q57's hash gate breaks.
    assert(BlockDials.signBits(0) == 1)
    assert(BlockDials.signBits(500) == 1)    // sf0.01
    assert(BlockDials.signBits(2000) == 2)   // sf0.1
    assert(BlockDials.signBits(20000) == 5)  // sf1
    assert(BlockDials.signBits(200000) == 9) // sf10
    assert(BlockDials.signBits(2000000) == 12)
    assert(BlockDials.signBits(Long.MaxValue / 4) == 16) // maxBits clamp
    // power-of-two edge: k = exactly 2^b must give b, not b+1
    assert(BlockDials.signBits(750L * 16) == 4)
    assert(BlockDials.signBits(750L * 16 + 1) == 5)
    // width: k = ceil(n/1250) bands over [0, mx]
    assert(BlockDials.lengthBucketWidth(500, 700) == 701)   // one band
    assert(BlockDials.lengthBucketWidth(50000, 700) == 18)  // 40 bands
    assert(BlockDials.lengthBucketWidth(500000, 700) == 2)  // 400 bands
    assert(BlockDials.lengthBucketWidth(0, 0) == 1)         // empty corpus
    // width never hits 0 even when bands outnumber characters
    assert(BlockDials.lengthBucketWidth(10000000, 3) == 1)
    // ivfLists: GREATEST(minLists, CEIL(n/targetList)) — oracle parity
    // for q124's params CTE
    assert(BlockDials.ivfLists(0) == 4)        // empty corpus -> floor
    assert(BlockDials.ivfLists(500) == 4)      // sf0.01 (ceil=1, floored)
    assert(BlockDials.ivfLists(2000) == 4)     // sf0.1
    assert(BlockDials.ivfLists(20000) == 40)   // sf1
    assert(BlockDials.ivfLists(200000) == 400) // sf10
    assert(BlockDials.ivfLists(500 * 4 + 1, targetList = 500) == 5)
    assert(BlockDials.ivfLists(500L * 4, targetList = 500) == 4) // exact multiple
  }

  test("blocking dials are blocking-only: narrow-dial pairs = " +
      "wide-dial pairs restricted to co-blocked docs") {
    // The q45/q57 auto-dial contract: resolution decides which pairs
    // are COMPARED, never a compared pair's score or threshold
    // outcome. So the narrow result must equal the wide result
    // filtered to pairs sharing a narrow block — any deviation means
    // the dial leaked into scoring.
    val docGen = for {
      nDocs <- Gen.choose(30, 80)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 30)
        toks <- Gen.listOfN(len, Gen.choose(0, 25))
      } yield toks.map(t => s"w$t").mkString(" "))
    } yield docs
    forAllSamples(docGen, n = 5) { texts =>
      val docs = texts.zipWithIndex
        .map { case (s, i) => (i.toLong, s, s.length) }
        .toDF("doc_id", "text", "n_chars")
      val lens = texts.zipWithIndex.map { case (s, i) => i.toLong -> s.length }.toMap
      val w = 40
      def pairs(width: Int): Set[(Long, Long)] = operators.Dedup
        .jaccardPairs(docs, $"doc_id", $"text",
          blockKeys = Seq(floor($"n_chars" / width.toDouble).cast("int")),
          threshold = 0.5, chunks = 4)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val wide = pairs(1 << 20) // one block: every pair compared
      val narrow = pairs(w)
      val expected = wide.filter { case (a, b) =>
        lens(a) / w == lens(b) / w
      }
      assert(narrow == expected)
    }
    // same contract for the sign-bit dial: nb+k buckets REFINE nb
    // buckets (bit i is independent of bit count), so the finer
    // result is the coarser one filtered to agreement on the extra bits
    val embGen = Gen.listOfN(60,
      Gen.listOfN(8, Gen.choose(-1.0, 1.0)))
    forAllSamples(embGen, n = 5) { vecs =>
      val emb = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat).toArray) }
        .toDF("vec_id", "embedding")
      def pairs(nb: Int): Set[(Long, Long)] = operators.Similarity
        .cosinePairsBlocked(emb, "vec_id", "embedding", 0.2, nb, chunks = 4)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val coarse = pairs(1)
      val fine = pairs(3)
      val bits = vecs.zipWithIndex.map { case (v, i) =>
        i.toLong -> (0 until 3).map(d => v(d).toFloat > 0).toVector
      }.toMap
      val expected = coarse.filter { case (a, b) => bits(a) == bits(b) }
      assert(fine == expected)
    }
  }
}
