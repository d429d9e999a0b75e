package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join on skewed data") {
    // 90% of rows share one hot key
    val left = (0 until 2000)
      .map(i => (if (i % 10 == 0) s"k$i" else "HOT", i))
      .toDF("key", "lv")
    val right = Seq(("HOT", 1), ("k10", 2), ("k20", 3), ("NONE", 4))
      .toDF("key", "rv")
    val plain = left.join(right.withColumnRenamed("key", "rk"),
        $"key" === $"rk").select($"lv", $"rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(left, right, "key", salts = 7)
      .select($"lv", $"rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("saltedDistinctCount equals plain countDistinct") {
    val df = (0 until 3000)
      .map(i => (if (i % 5 == 0) "HOT" else s"k${i % 13}", s"u${i % 97}"))
      .toDF("key", "user")
    val plain = df.groupBy($"key")
      .agg(countDistinct($"user").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedDistinctCount(df, "key", "user", 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
