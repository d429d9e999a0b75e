package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, n_tok) — stream: starts 0,3,8,8,15,25 with budget 10
    (1L, 3L), (2L, 5L), (3L, 0L), (4L, 7L), (5L, 10L), (7L, 4L))
    .toDF("doc_id", "n_tok")

  test("packByTokenBudget = exclusive prefix sum in id order") {
    val got = Packing
      .packByTokenBudget(docs, $"doc_id", $"n_tok", budget = 10)
      .select($"doc_id", $"start", $"window_id")
      .as[(Long, Long, Long)].collect()
      .map { case (k, s, w) => k -> ((s, w)) }.toMap
    // doc 3 (0 tokens) and doc 4 share start 8; doc 5 STRADDLES the
    // window-1 boundary and belongs to window 1 (its start), window 2
    // only begins with doc 7 at offset 25
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((3L, 0L)), 3L -> ((8L, 0L)),
      4L -> ((8L, 0L)), 5L -> ((15L, 1L)), 7L -> ((25L, 2L))))
  }

  test("bucket decomposition is width-independent (incl. sparse ids)") {
    // ids far apart so small widths create many (mostly empty) buckets
    val sparse = Seq((5L, 2L), (1000L, 3L), (1001L, 4L), (50000L, 5L))
      .toDF("doc_id", "n_tok")
    val ref = Packing
      .packByTokenBudget(sparse, $"doc_id", $"n_tok", 4, bucketWidth = 1L << 40)
      .select($"doc_id", $"start").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 1024L)) {
      val got = Packing
        .packByTokenBudget(sparse, $"doc_id", $"n_tok", 4, bucketWidth = w)
        .select($"doc_id", $"start").as[(Long, Long)].collect().toSet
      assert(got == ref, s"bucketWidth=$w")
    }
  }

  test("bucket offsets are broadcast and the corpus exchange is reused") {
    val packed = Packing
      .packByTokenBudget(docs, $"doc_id", $"n_tok", 10, bucketWidth = 2L)
    packed.collect() // materialize THIS plan so AQE finalizes reuse
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    // the offsets branch must read the windowed cumsum via exchange
    // reuse, not re-scan the input: exactly one non-broadcast source
    assert(plan.contains("ReusedExchange"), plan)
  }
}
