package graft

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry() produces rows on the smoke dataset") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query name has unique spelling and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.size == SparkEntry.catalogs.flatMap(_.queries).size,
      "duplicate query names across catalogs")
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), k))
    SparkEntry.benchQueries.foreach(k => assert(qs.contains(k), k))
  }
}
