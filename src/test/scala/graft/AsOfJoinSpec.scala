package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 15L, "m"),
                   (2L, 5L, "c"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, "X"), (1L, 15L, "Y"), (2L, 99L, "Z"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv"))
      .as[(Long, Long, String, Option[String])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got((1L, 10L)).contains("X")) // equal ts is inclusive
    assert(got((1L, 15L)).contains("Y"))
    assert(got((1L, 20L)).contains("Y")) // latest prior, not first
    assert(got((2L, 5L)).isEmpty)        // right row is in the future
  }

  test("left rows and columns survive unchanged (left outer semantics)") {
    val left = Seq((1L, 1L, 7.5), (3L, 2L, 0.0)).toDF("k", "ts", "payload")
    val right = Seq((1L, 1L, "r")).toDF("k", "ts", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv"))
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "asof_rv"))
    assert(out.count() == 2)
  }
}
