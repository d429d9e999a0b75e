package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected catalog
  * queries so pushdown / broadcast / codegen properties can be checked
  * (and re-checked after changes). Run:
  *   sbt "runMain graft.Plans q01_scan_filter q03_star_join ..."
  * With no args, audits a representative set.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_scan_filter", "q03_star_join", "q21_priority_dedup",
      "q43_minhash_lsh_pairs", "q45_jaccard_pairs", "q50_ann_bruteforce",
      "q60_events_tumbling")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
