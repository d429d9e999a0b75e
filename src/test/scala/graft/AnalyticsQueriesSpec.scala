package graft

import org.apache.spark.sql.Row

import graft.queries.AnalyticsQueries

/** Semantic invariants for the round-5 analytics catalog on sf0.001.
  * Cross-engine value equality is the q73-q81 DuckDB oracle's job;
  * these pin relationships the hash compare can't see (estimate error
  * bounds, funnel monotonicity, pivot shape).
  */
class AnalyticsQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    AnalyticsQueries.queries.find(_.name == name).get.run(spark, sf)

  test("q73 cube: exactly one grand-total row, and it counts everything") {
    val rows = run("q73_cube").collect()
    val grand = rows.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1)
    val detail = rows.filter(_.getAs[Int]("gid") == 0)
    assert(detail.map(_.getAs[Long]("n_rows")).sum
      == grand.head.getAs[Long]("n_rows"))
  }

  test("q74 pivot: one row per user, one column per event type") {
    val df = run("q74_pivot")
    assert(df.columns.toSeq
      == Seq("user_id", "view", "click", "purchase", "signup", "error"))
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("q76 KMV estimate lands within 25% of the exact distinct count") {
    val Row(_, _, est: Long, exact: Long) = run("q76_kmv_distinct").head()
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"KMV est=$est exact=$exact")
  }

  test("q78 chunk dedup: shared counts never exceed chunk counts") {
    val bad = run("q78_chunk_dedup")
      .where("n_shared > n_chunks OR n_chunks <= 0").count()
    assert(bad == 0)
  }

  test("q79 funnel: stage user counts cover every user exactly once") {
    val events = Tables.load(spark, sf, "events")
    val nUsers = events.select("user_id").distinct().count()
    val staged = run("q79_funnel").collect()
    assert(staged.map(_.getAs[Long]("n_users")).sum == nUsers)
    assert(staged.forall(r => (0 to 3).contains(r.getAs[Int]("stage"))))
  }

  test("q81 unpivot: three measures, each with the full row count") {
    val n = Tables.load(spark, sf, "lineitem").count()
    val rows = run("q81_unpivot").collect()
    assert(rows.map(_.getAs[String]("measure")).toSeq
      == Seq("discount", "price", "tax"))
    assert(rows.forall(_.getAs[Long]("n") == n))
  }
}
