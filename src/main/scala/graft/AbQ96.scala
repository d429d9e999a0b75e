package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for q96's hierarchy walk: hand-rolled pointer doubling
  * (operators/PointerDoubling.scala — ceil(log2 depth) self-join
  * rounds, ~5 sequential jobs) vs Spark 4's native recursive CTE
  * (`WITH RECURSIVE`, one query plan whose UnionLoop iterates
  * depth-many times inside a single execution).
  *
  * The open question from the round-13 verdict: q96's 1.8 s at sf1 is
  * adjudicated as a constant job-launch floor, and the native CTE runs
  * depth-many ITERATIONS but launches them inside one plan — if the
  * per-iteration cost is lower than a self-join round's job wave, the
  * single-plan form wins despite doing log-many times MORE rounds.
  * This main measures both on identical data and checks they agree.
  *
  *   sbt "runMain graft.AbQ96 /root/testdata/sf1 [reps=5]"
  */
object AbQ96 {

  private def ptrDoubling(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame =
    SparkEntry.queries("q96_recursive_cte")(spark, dir)

  private def recursiveCte(spark: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame = {
    Tables.load(spark, dir, "part").createOrReplaceTempView("part_ab")
    // the literal walk, same aggregate contract as q96
    spark.sql(
      """WITH RECURSIVE tree(key, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS key, 0 AS depth
        |  UNION ALL
        |  SELECT p.p_partkey, t.depth + 1
        |  FROM part_ab p JOIN tree t
        |    ON CAST(FLOOR(p.p_partkey / 2.0) AS BIGINT) = t.key
        |  WHERE p.p_partkey > 0
        |)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(key) AS min_key, MAX(key) AS max_key
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(mk: () => DataFrame): (Seq[org.apache.spark.sql.Row], Seq[Double]) = {
      var rows: Seq[org.apache.spark.sql.Row] = Nil
      val ts = (0 until reps + 1).map { _ =>
        val t0 = System.nanoTime()
        rows = mk().collect().toSeq
        (System.nanoTime() - t0) / 1e9
      }
      (rows, ts.drop(1).sorted) // first run is warm-up
    }

    val (aRows, aT) = timed(() => ptrDoubling(spark, dir))
    val (bRows, bT) = timed(() => recursiveCte(spark, dir))
    require(aRows == bRows,
      s"variants disagree:\n  ptr=${aRows.take(5)}\n  cte=${bRows.take(5)}")
    def stats(ts: Seq[Double]) =
      f"min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f max=${ts.last}%6.3f"
    println(s"# q96 A/B @ $dir ($reps timed reps, identical results: true)")
    println(s"pointer-doubling  ${stats(aT)}")
    println(s"recursive-cte     ${stats(bT)}")
    spark.stop()
  }
}
