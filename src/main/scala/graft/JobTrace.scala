package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        println(s"[jobtrace] job=${j.jobId} stages=${j.stageInfos.size} $names")
      }
    })
    val n = args.head
    val fn = SparkEntry.queries(n)
    fn(spark, sfDir).count() // warm
    println(s"[jobtrace] ---- timed pass of $n ----")
    fn(spark, sfDir).count()
    Thread.sleep(500)
    spark.stop()
  }
}
