package graft

import graft.etl.CidEtl

/** The DATASUS normalization edge branches the goldens don't reach:
  * P3 (no `codigo`/`cid_codigo` column → FIRST column becomes the
  * code, /root/reference/etl_cid10.py:118-121) and P4 (missing
  * `descricao` tolerated as null, :122-124).
  */
class PrepareDatasusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cats = Seq(
    ("A00", "A00-A09", "Intestinal", "A00-B99", "Chapter I"))
    .toDF("category_code", "block_id", "block_title",
          "chapter_code", "chapter_title")

  test("P3: arbitrary first column becomes the code column") {
    val raw = Seq((" a00.1 ", "ignored"), ("B99", "x"))
      .toDF("whatever_name", "other")
    val out = CidEtl.prepareDatasus(raw, cats)
      .select($"cid_codigo", $"cid_categoria", $"bloco_codigo")
      .as[(String, String, Option[String])].collect().toMap2
    assert(out("A00.1") == ("A00", Some("A00-A09"))) // normalized + enriched
    assert(out("B99") == ("B99", None))              // no category match
  }

  test("P4: missing descricao yields null titulo/descricao") {
    val raw = Seq(Tuple1("A00.1")).toDF("codigo")
    val row = CidEtl.prepareDatasus(raw, cats)
      .select($"titulo", $"descricao", $"fonte").collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getString(2) == "DATASUS")
  }

  implicit class RowsOps(rows: Array[(String, String, Option[String])]) {
    def toMap2: Map[String, (String, Option[String])] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
