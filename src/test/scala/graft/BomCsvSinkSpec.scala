package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sinks.BomCsvSink

/** Sink details beyond the byte-level goldens: multi-partition inputs
  * concatenate completely, quoting handles separators and quotes, and
  * the BOM appears exactly once.
  */
class BomCsvSinkSpec extends SparkSpec {
  import spark.implicits._

  test("multi-partition write loses no rows and keeps one BOM") {
    val df = (0 until 997).map(i => (i, s"v;$i", s"""q"$i""""))
      .toDF("id", "semi", "quo").repartition(7)
    val out = Files.createTempDirectory("sink").resolve("out.csv").toString
    BomCsvSink.write(df, out)
    val bytes = Files.readAllBytes(Paths.get(out))
    assert(bytes.take(3).toSeq == Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    val text = new String(bytes.drop(3), StandardCharsets.UTF_8)
    assert(!text.contains("﻿")) // BOM only at the very start
    val lines = text.split("\n").filter(_.nonEmpty)
    assert(lines.head == "\"id\";\"semi\";\"quo\"")
    assert(lines.length == 998) // header + 997 rows
    // semicolons inside cells stay quoted; embedded quotes doubled
    assert(lines.exists(_.contains("\"v;42\"")))
    assert(lines.exists(_.contains("\"q\"\"42\"\"\"")))
    // every id survives the part-file concatenation
    val ids = lines.tail.map(_.split(";")(0).replace("\"", "").toInt).toSet
    assert(ids == (0 until 997).toSet)
  }

  test("sorted multi-partition write preserves global order through part concat") {
    // an orderBy'd frame is RANGE partitioned: part-00000 holds the
    // lowest key range, part-00001 the next, ... — so concatenating
    // part files in name order (what write() does) yields a globally
    // sorted single file. This is the contract that lets a LARGE
    // consolidated export stay ordered without a single-partition
    // bottleneck before the (inherently serial) concat.
    // repartitionByRange + sortWithinPartitions is the same physical
    // layout orderBy produces, with the partition count pinned so AQE
    // can't coalesce this small fixture down to one partition
    val df = (0 until 5000).map(i => (i * 7919 % 5000, s"r$i"))
      .toDF("k", "v").repartitionByRange(5, $"k").sortWithinPartitions($"k")
    assert(df.rdd.getNumPartitions > 1, "fixture must exercise >1 partition")
    val out = Files.createTempDirectory("sink").resolve("sorted.csv").toString
    BomCsvSink.write(df, out)
    val text = new String(Files.readAllBytes(Paths.get(out)).drop(3),
      StandardCharsets.UTF_8)
    val keys = text.split("\n").filter(_.nonEmpty).drop(1)
      .map(_.split(";")(0).replace("\"", "").toInt).toSeq
    assert(keys.length == 5000)
    assert(keys == keys.sorted, "part-file concat broke the global order")
  }

  test("null cells render as quoted-empty like pandas QUOTE_ALL") {
    val df = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "v")
    val out = Files.createTempDirectory("sink").resolve("n.csv").toString
    BomCsvSink.write(df, out)
    val text = new String(Files.readAllBytes(Paths.get(out)).drop(3),
      StandardCharsets.UTF_8)
    assert(text.contains("\"1\";\"\""))
  }
}
