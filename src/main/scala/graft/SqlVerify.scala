package graft

import java.nio.file.{Files, Paths}

/** Batch SQL runner for the differential fuzz gate
  * (tools/fuzz_sql.py): reads a JSON map name -> SQL, executes each
  * statement with spark.sql over the test tables registered as temp
  * views, and writes results in Verify's on-disk shape
  * (outDir/<name>.parquet + outDir/oracle_sql.json) so
  * tools/oracle_check.py compares them against DuckDB unchanged.
  *
  * This exercises a DIFFERENT surface than Verify: the queries travel
  * through Spark's SQL parser (not the DataFrame API), so the fuzz
  * gate differentially tests parser + analyzer + optimizer + execution
  * against an independent engine on inputs nobody hand-picked.
  *
  *   sbt "runMain graft.SqlVerify <sfDir> <outDir> <sqlJson>"
  */
object SqlVerify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, sqlJson) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    Tables.all.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    // Jackson (bundled with Spark) parses the generator's output; keys
    // are run in sorted order so failures reproduce positionally.
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(sqlJson))
    val names = {
      val it = root.fieldNames()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq.sorted
    }
    var failed = 0
    names.foreach { name =>
      val sql = root.get(name).asText
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[sqlverify] $name failed: ${e.getMessage}")
      }
    }
    Files.copy(Paths.get(sqlJson), Paths.get(s"$outDir/oracle_sql.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
    println(s"[sqlverify] ${names.size - failed}/${names.size} executed")
    if (failed > 0) sys.exit(1)
  }
}
