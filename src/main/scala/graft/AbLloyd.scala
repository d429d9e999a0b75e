package graft

import org.apache.spark.sql.functions._

/** Exchange-count evidence for the r22 one-pass Lloyd step
  * (Similarity.trainCentroids): builds ONE k-means iteration's means
  * aggregate over the same assigned frame in both forms — the r21
  * posexplode → (centroid, dim) decimal-sum → (centroid) collect_list
  * shape and the r22 VectorMeanParts single-aggregate shape — executes
  * each, and prints the executed plan plus its Exchange count. Also
  * asserts the two results are identical (the SimilaritySpec property,
  * replayed on the real data).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbLloyd"
  */
object AbLloyd {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.load(spark, sfDir, "embeddings")
    val v = e.select(col("vec_id").as("cid"),
      graft.functions.VectorFunctions.toDoubles(col("embedding")).as("v"))
    // stand-in assignment (id mod 8) — the means aggregate's input
    // shape, without dragging the full assign chain into the plan
    val assigned = v.withColumn("centroid_id", pmod(col("cid"), lit(8L)))

    val oldForm = assigned
      .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(round(sum(col("x").cast(
          org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double") / count(col("x")), 9).as("m"))
      .groupBy(col("centroid_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("centroid_id"),
        transform(col("dm"), s => s.getField("m")).as("centroid"))

    val newForm = assigned
      .groupBy(col("centroid_id"))
      .agg(graft.functions.expressions.CustomExpressions
        .vectorMeanParts(col("v")).as("mp"))
      .select(col("centroid_id"),
        transform(col("mp"),
          p => round(p.getField("s") / p.getField("c"), 9)).as("centroid"))

    def audit(label: String, df: org.apache.spark.sql.DataFrame): String = {
      val rows = df.collect()
      val p = df.queryExecution.executedPlan.toString
      val executed = p.split("== Initial Plan ==")(0)
      val exchanges = "Exchange ".r.findAllIn(executed).size -
        "ReusedExchange".r.findAllIn(executed).size
      println(s"\n======== Lloyd means, $label form ========")
      println(executed)
      println(s"[$label] exchanges=$exchanges rows=${rows.length}")
      rows.sortBy(_.getLong(0))
        .map(r => r.getLong(0) + ":" + r.getSeq[Double](1).mkString(","))
        .mkString("\n")
    }

    val a = audit("r21-exploded", oldForm)
    val b = audit("r22-one-pass", newForm)
    println(if (a == b) "[ablloyd] results IDENTICAL"
            else "[ablloyd] RESULTS DIVERGED")
    spark.stop()
  }
}
