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

  test("rate table broadcasts; the corpus is never shuffled for the join") {
    val out = Mixture.resampleToShares(docs, $"doc_id", $"src", $"n_tok",
      Seq("a" -> 0.75, "b" -> 0.25))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
