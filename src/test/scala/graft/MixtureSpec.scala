package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixture

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // two sources, 100 tokens each; target 75/25 ⇒ "a" binds
  // (T = 100/.75 = 133.3, rate_a = 1) and "b" thins to ~.333
  private val docs = (1L to 200L)
    .map(i => (i, if (i <= 100) "a" else "b", 1L))
    .toDF("doc_id", "src", "n_tok")

  test("binding source keeps rate 1; others thin toward their share") {
    val out = Mixture
      .resampleToShares(docs, $"doc_id", $"src", $"n_tok",
        Seq("a" -> 0.75, "b" -> 0.25))
      .select($"src", $"doc_id", $"mix_rate")
      .as[(String, Long, Double)].collect()
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc("a") == 100) // rate 1 — every doc survives
    // b's rate is exactly 1/3; the md5 coin keeps roughly that many
    val bKept = bySrc.getOrElse("b", 0)
    assert(bKept > 15 && bKept < 55, s"b kept $bKept of 100")
    assert(out.filter(_._1 == "a").forall(_._3 == 1.0))
    assert(out.filter(_._1 == "b").forall(r => math.abs(r._3 - 1.0 / 3) < 1e-12))
  }

  test("unlisted sources are dropped; determinism across runs") {
    val withC = docs.union(Seq((999L, "c", 50L)).toDF("doc_id", "src", "n_tok"))
    def run() = Mixture
      .resampleToShares(withC, $"doc_id", $"src", $"n_tok",
        Seq("a" -> 0.75, "b" -> 0.25))
      .select($"doc_id").as[Long].collect().toSet
    val first = run()
    assert(!first.contains(999L))
    assert(run() == first)
  }

  test("invalid shares are rejected") {
    intercept[IllegalArgumentException] {
      Mixture.resampleToShares(docs, $"doc_id", $"src", $"n_tok",
        Seq("a" -> 0.6, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] {
      Mixture.resampleToShares(docs, $"doc_id", $"src", $"n_tok",
        Seq("a" -> 1.5, "b" -> -0.5))
    }
    // duplicate group names would duplicate every doc of that group
    // through the rates join — rejected up front
    val dup = intercept[IllegalArgumentException] {
      Mixture.resampleToShares(docs, $"doc_id", $"src", $"n_tok",
        Seq("a" -> 0.5, "a" -> 0.25, "b" -> 0.25))
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("randomized invariants: subset, no duplication, rates in (0,1], " +
      "achieved tokens never exceed target share of the feasible total") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val nGroups = 2 + rnd.nextInt(3)
      val groups = (0 until nGroups).map(g => s"g$g")
      // uneven corpus: group g has (g+1)*60 docs of random 1..9 tokens
      val rows = groups.zipWithIndex.flatMap { case (g, gi) =>
        (1 to (gi + 1) * 60).map { i =>
          (gi * 100000L + i, g, 1L + rnd.nextInt(9))
        }
      }
      val corpus = rows.toDF("doc_id", "src", "n_tok")
      // random positive shares normalized to 1
      val raw = groups.map(_ => 0.05 + rnd.nextDouble())
      val shares = groups.zip(raw.map(_ / raw.sum))
      val out = Mixture
        .resampleToShares(corpus, $"doc_id", $"src", $"n_tok", shares)
        .select($"doc_id", $"src", $"n_tok", $"mix_rate")
        .as[(Long, String, Long, Double)].collect()
      val inputIds = rows.map(_._1).toSet
      assert(out.forall(r => inputIds.contains(r._1)), s"trial $trial")
      assert(out.map(_._1).distinct.length == out.length,
        s"trial $trial duplicated a doc")
      assert(out.forall(r => r._4 > 0 && r._4 <= 1.0), s"trial $trial")
      // feasible total T = min(tok_g / w_g); kept tokens per group must
      // stay under w_g * T plus one doc of slack (the md5 coin is
      // per-doc, so overshoot is bounded by the last doc's size)
      val tokByG = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val t = shares.map { case (g, w) => tokByG(g) / w }.min
      val keptByG = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      for ((g, w) <- shares) {
        val cap = w * t + 9 // + max doc size
        assert(keptByG.getOrElse(g, 0L) <= cap * 1.35 + 20,
          s"trial $trial group $g kept ${keptByG.getOrElse(g, 0L)} " +
            s"vs cap $cap")
      }
    }
  }

  test("rate table broadcasts; the corpus is never shuffled for the join") {
    val out = Mixture.resampleToShares(docs, $"doc_id", $"src", $"n_tok",
      Seq("a" -> 0.75, "b" -> 0.25))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
