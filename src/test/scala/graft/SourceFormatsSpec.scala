package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth beyond CSV and flat parquet: JSONL
  * round-trip with an explicit schema, text-line source, and a
  * lang-partitioned parquet layout whose reads prune partitions (the
  * 100 TB lever: a filtered scan touches only matching directories).
  */
class SourceFormatsSpec extends SparkSpec {

  private def tmpDir(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString

  test("JSONL round-trip with explicit schema preserves rows") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmpDir("jsonl")
    docs.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // explicit schema: no inference scan, the production contract
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    val b = back.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("text source reads raw lines") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("value"))
    val dir = tmpDir("text")
    docs.write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == docs.count())
  }

  test("PERMISSIVE JSON keeps corrupt lines in _corrupt_record") {
    val dir = tmpDir("corrupt")
    Files.write(java.nio.file.Paths.get(dir, "data.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "ok"}""",
        """{"doc_id": oops not json""",
        """{"doc_id": 3, "text": "fine"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir).cache()
    try {
      assert(df.count() == 3)
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(df.filter(col("doc_id") === 1 && col("text") === "ok")
        .count() == 1)
      // FAILFAST surfaces the parse error instead
      val thrown = intercept[Exception] {
        spark.read.schema(StructType(schema.dropRight(1)))
          .option("mode", "FAILFAST").json(dir).collect()
      }
      assert(thrown != null)
    } finally df.unpersist()
  }

  test("malformed CSV rows drop under DROPMALFORMED, survive PERMISSIVE") {
    val dir = tmpDir("badcsv")
    // "9,extra,cols,here" is structurally malformed (wrong column
    // count); "2,not_a_number" fails the Long cast — with the column
    // actually parsed, DROPMALFORMED drops both, PERMISSIVE nulls the
    // bad cell and keeps every line
    Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      java.util.Arrays.asList("id,n",
        "1,10", "2,not_a_number", "9,extra,cols,here", "3,30"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    // collect(), not count(): count() prunes every column, and CSV
    // malformed-row detection only runs for columns actually parsed
    val dropped = spark.read.schema(schema).option("header", "true")
      .option("mode", "DROPMALFORMED").csv(dir).collect()
    assert(dropped.length == 2)
    assert(dropped.map(_.getLong(0)).toSet == Set(1L, 3L))
    val kept = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE").csv(dir).collect()
    assert(kept.length == 4)
    assert(kept.count(_.isNullAt(1)) >= 1)
  }

  test("partitioned parquet write prunes partitions on filtered read") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmpDir("part_parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    // the partition filter must reach the scan, not a post-scan Filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"partition filter not pushed:\n$plan")
    val expected = docs.filter(col("lang") === "en").count()
    assert(filtered.count() == expected && expected > 0)
  }
}
