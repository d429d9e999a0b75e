package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate

import graft.etl.CidEtl

/** End-to-end golden tests: the full pipeline vs frozen outputs of the
  * reference run on the miniature fixtures (tools/make_cid_fixtures.py,
  * clock pinned to 2026-01-15).
  *
  * Row ORDER is not part of the contract — the reference's unstable
  * sort permutes rows arbitrarily (etl_cid10.py:183) — so data lines
  * are compared as sorted multisets, byte-exact per line; the header
  * and the UTF-8 BOM are compared exactly.
  */
class CidEtlSpec extends SparkSpec {

  private val res = "src/test/resources"
  private val clock = LocalDate.parse("2026-01-15")

  private def readLines(path: String): (Array[Byte], String, Seq[String]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bom = bytes.take(3)
    val text = new String(bytes.drop(3), StandardCharsets.UTF_8)
    val lines = text.split("\n", -1).filter(_.nonEmpty).toSeq
    (bom, lines.head, lines.tail.sorted)
  }

  private def assertGolden(out: String, golden: String): Unit = {
    val (bomG, headG, dataG) = readLines(golden)
    val (bomO, headO, dataO) = readLines(out)
    assert(bomO.toSeq == bomG.toSeq, "UTF-8 BOM")
    assert(headO == headG, "header line")
    assert(dataO == dataG, "data lines (sorted)")
  }

  test("dir mode matches reference golden byte-for-byte") {
    val out = Files.createTempDirectory("cid").resolve("dir.csv").toString
    val q = CidEtl.runFromDatasusDir(spark, s"$res/cid_official", out, clock)
    assert(q.total == 9)
    assert(q.missingHierarchy == 1)
    assertGolden(out, s"$res/golden/dir_mode.csv")
  }

  test("combined mode matches reference golden byte-for-byte") {
    val out = Files.createTempDirectory("cid").resolve("comb.csv").toString
    val q = CidEtl.runCombined(spark,
      s"$res/cid_structured/datasus.csv",
      s"$res/cid_structured/chapters.csv",
      s"$res/cid_structured/blocks.csv",
      s"$res/cid_structured/categories.csv",
      s"$res/cid_structured/subcategories.csv",
      out, clock)
    assert(q.total == 6)
    assert(q.missingHierarchy == 2)
    assertGolden(out, s"$res/golden/combined_mode.csv")
  }
}
