package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Job/stage/task-count profile of catalog queries — the adjudication
  * tool for "is this query's cost real work or the local job-launch
  * floor?" (each AQE stage materialization is a separate job in
  * local mode, so at sf0.1 a ~0.1 s launch floor × job count can
  * dominate). Runs each named query once to warm, then once counted:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AbJobs q124_cosine_topk_indexed"
  */
object AbJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm (codegen, footers, plan cache)
      Thread.sleep(200)        // let straggler listener events drain
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[abjobs] $n%-34s jobs=${jobs.get}%3d stages=${stages.get}%3d " +
        f"tasks=${tasks.get}%5d sec=$sec%6.3f")
    }
    spark.stop()
  }
}
