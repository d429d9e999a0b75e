package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sinks.ShardedSink

class ShardedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_sharded").toString

  test("one directory per shard; rows inside each shard are key-ordered") {
    val out = tmpDir()
    val docs = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    ShardedSink.writeSharded(docs, $"doc_id", out, nibbles = 1)
    val shardDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard="))
      .map(_.getFileName.toString).toSeq.sorted
    assert(shardDirs.size == 16, shardDirs) // 16^1, all populated at n=500
    // per shard: re-read just that directory and check the key order
    // matches a local sort of its own keys (the loader-visible order)
    for (d <- shardDirs.take(3)) {
      val keys = spark.read.parquet(s"$out/$d")
        .select($"shuffle_key").as[String].collect()
      assert(keys.sameElements(keys.sorted), s"$d not internally sorted")
    }
  }

  test("re-materialization is identical: same rows per shard on re-run") {
    val docs = (1L to 300L).map(i => (i, i % 7)).toDF("doc_id", "v")
    def shardOf(dir: String): Map[String, Seq[Long]] = {
      ShardedSink.writeSharded(docs, $"doc_id", dir)
      spark.read.parquet(dir).select($"shard", $"doc_id")
        .as[(String, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq.sorted).toMap
    }
    assert(shardOf(tmpDir()) == shardOf(tmpDir()))
  }

  test("readVerified round-trips the layout and returns every row") {
    val out = tmpDir()
    val docs = (1L to 200L).map(i => (i, i * 3)).toDF("doc_id", "v")
    ShardedSink.writeSharded(docs, $"doc_id", out)
    val back = ShardedSink.readVerified(spark, out, $"doc_id")
    assert(back.select($"doc_id").as[Long].collect().toSet ==
      (1L to 200L).toSet)
  }

  test("readVerified survives all-numeric shard directory names") {
    // ids chosen so every populated shard directory name is all-digits
    // (md5 prefixes "02","16","45","65") — Hive partition discovery
    // then type-infers `shard` as int and '02' round-trips as 2.
    // readVerified must restore the canonical zero-padded hex form
    // rather than throw a false contract violation.
    val out = tmpDir()
    val docs = Seq(27L, 6L, 9L, 11L).map(i => (i, i * 3)).toDF("doc_id", "v")
    ShardedSink.writeSharded(docs, $"doc_id", out)
    val back = ShardedSink.readVerified(spark, out, $"doc_id")
    assert(back.select($"shard").as[String].collect().toSet
      .contains("02"))
    assert(back.select($"doc_id").as[Long].collect().toSet ==
      Set(27L, 6L, 9L, 11L))
  }

  test("readVerified throws on a tampered layout (row in wrong shard)") {
    val out = tmpDir()
    val docs = (1L to 200L).map(i => (i, i * 3)).toDF("doc_id", "v")
    ShardedSink.writeSharded(docs, $"doc_id", out)
    // move one shard's file into another shard directory: its rows'
    // md5 prefixes no longer match the directory they sit in
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard=")).toSeq.sorted
    val victim = Files.list(dirs.head).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    Files.move(victim,
      dirs(1).resolve("smuggled-" + victim.getFileName.toString))
    val e = intercept[Exception] {
      ShardedSink.readVerified(spark, out, $"doc_id").count()
    }
    assert(String.valueOf(e.getMessage)
        .contains("read-back contract violated") ||
      Option(e.getCause).exists(c => String.valueOf(c.getMessage)
        .contains("read-back contract violated")), e.toString)
  }

  test("a shard-filtered read prunes to that one partition directory") {
    val out = tmpDir()
    val docs = (1L to 400L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    ShardedSink.writeSharded(docs, $"doc_id", out, nibbles = 1)
    val one = spark.read.parquet(out)
      .filter($"shard" === "a").select($"doc_id")
    one.collect()
    val scan = one.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // partition pruning must reach the scan: of the 16 shard dirs the
    // loader reads exactly one — the property that lets a resumed
    // trainer re-read a single shard without scanning the corpus
    assert(scan.metadata("PartitionFilters").contains("shard"),
      scan.metadata("PartitionFilters"))
    assert(scan.relation.location.inputFiles
      .count(_.contains("shard=")) >= 16) // layout has all 16
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead == 1, s"expected 1 pruned partition, got $partsRead")
  }

  test("plan: one hash exchange on shard, per-partition sort, no global sort") {
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = tmpDir()
    val laid = ShardedSink.writeSharded(docs, $"doc_id", out)
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    // Sort node must be non-global (sortWithinPartitions)
    assert("Sort \\[.*\\], false".r.findFirstIn(plan).isDefined
      || plan.contains("global=false"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }
}
