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
