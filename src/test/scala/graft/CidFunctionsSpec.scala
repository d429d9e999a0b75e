package graft

import org.apache.spark.sql.functions._

import graft.functions.CidFunctions._

/** F1–F11 expression equivalence incl. null / whitespace / 4th-char
  * edge cases (/root/reference/etl_cid10.py:11-21, 249-258).
  */
class CidFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column, v: String): Any = {
    val r = Seq(Option(v)).toDF("v").select(c).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("normalizeCode trims, uppercases, propagates null") {
    assert(eval1(normalizeCode($"v"), "  t65.9 ") == "T65.9")
    assert(eval1(normalizeCode($"v"), null) == null)
    assert(eval1(normalizeCode($"v"), "a00") == "A00")
  }

  test("extractRootCategory keeps text before first dot") {
    assert(eval1(extractRootCategory($"v"), "T65.9") == "T65")
    assert(eval1(extractRootCategory($"v"), " a00.0 ") == "A00")
    assert(eval1(extractRootCategory($"v"), "A00") == "A00")
    assert(eval1(extractRootCategory($"v"), null) == null)
  }

  test("subcategoryMarker keeps only dotted codes") {
    assert(eval1(subcategoryMarker($"v"), "A00.0") == "A00.0")
    assert(eval1(subcategoryMarker($"v"), "A00") == null)
    assert(eval1(subcategoryMarker($"v"), null) == null)
  }

  test("formatSubcat inserts dot after 3rd char when 4th is non-blank") {
    assert(eval1(formatSubcat($"v"), "A000") == "A00.0")
    assert(eval1(formatSubcat($"v"), "t651") == "T65.1")
    // official files pad position 4 with a space when no subcategory
    assert(eval1(formatSubcat($"v"), "A00 ") == "A00")
    assert(eval1(formatSubcat($"v"), "A00") == "A00")
    assert(eval1(formatSubcat($"v"), "A0005") == "A00.05")
    assert(eval1(formatSubcat($"v"), null) == null)
  }

  test("categoryKeyOf takes raw 3-char prefix uppercased (no trim)") {
    assert(eval1(categoryKeyOf($"v"), "a150") == "A15")
    assert(eval1(categoryKeyOf($"v"), "A00 ") == "A00")
    assert(eval1(categoryKeyOf($"v"), "A0") == "A0")
  }

  test("rangeId concatenates trimmed bounds") {
    val df = Seq((" A00 ", "A09")).toDF("s", "e")
    assert(df.select(rangeId($"s", $"e")).collect()(0).getString(0) == "A00-A09")
  }

  test("normalizeCode is idempotent (property)") {
    val samples = Seq("a00.0", " T65 ", "z99.9  ", "A", "", "0x.Y")
    val df = samples.toDF("v")
    val once = df.select(normalizeCode($"v").as("n"))
    val twice = once.select(normalizeCode($"n").as("n"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
