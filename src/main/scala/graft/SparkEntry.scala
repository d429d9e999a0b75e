package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in the graft.queries.* catalogs; this object only
  * flattens them into the driver's Map shape.
  */
object SparkEntry {

  /** Every query catalog in the engine. Order matters only for display. */
  val catalogs: Seq[Catalog] = Seq(
    CoreQueries, CoreQueries2, CoreQueries3, TextQueries, DedupQueries,
    SimilarityQueries, EventQueries, AnalyticsQueries,
    IncrementalQueries)

  private lazy val allQueries: Seq[Q] = catalogs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries.find(_.name == "q02_agg_pricing").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Names of headline queries for Bench (subset of queries). */
  def benchQueries: Seq[String] = allQueries.filter(_.bench).map(_.name)
}
