package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration

import graft.sources.ParquetStats

/** Footer-statistics reader: flat files, nested (Hive-partitioned)
  * directories, and the no-stats fallback.
  */
class ParquetStatsSpec extends SparkSpec {
  import spark.implicits._

  private val conf = new Configuration()

  test("maxLong reads the column max from a flat directory") {
    val dir = Files.createTempDirectory("pstats-flat").toString
    Seq(1L, 5L, 3L).toDF("k").write.mode("overwrite").parquet(dir)
    assert(ParquetStats.maxLong(conf, dir, "k") == Some(5L))
  }

  test("maxLong recurses into partition subdirectories — a partial " +
      "max from only the top level is never returned") {
    val dir = Files.createTempDirectory("pstats-part").toString
    // Hive-partitioned layout: part files live one level down, and the
    // true max (99) is in a subdirectory
    Seq((1L, "a"), (99L, "b"), (7L, "a")).toDF("k", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    assert(ParquetStats.maxLong(conf, dir, "k") == Some(99L))
  }

  test("missing path / missing column fall back to None") {
    assert(ParquetStats.maxLong(conf, "/nonexistent/x.parquet", "k").isEmpty)
    val dir = Files.createTempDirectory("pstats-none").toString
    Seq(1L).toDF("k").write.mode("overwrite").parquet(dir)
    assert(ParquetStats.maxLong(conf, dir, "nope").isEmpty)
  }
}
