package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.expressions.CustomExpressions._

/** Scratch stage profiler for q115 (dev tool). */
object ProfQ115 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val threshold = 0.9
    val chunks = 32

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val df = Tables.load(spark, sfDir, "documents")
    val toks = df.select(col("doc_id").as("doc_id"),
      array_distinct(transform(tokens(col("text")), t => xxhash64(t))).as("th"))
    val expl = toks.select(col("doc_id"), explode(col("th")).as("tok"))
    val dfreq = expl.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    val rarity = expl.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok")))).as("rt"))
      .select(col("doc_id"),
        transform(col("rt"), s => s.getField("tok")).as("rtoks"))
    val docs = toks
      .select(col("doc_id"), array_sort(col("th")).as("stoks"))
      .join(rarity, "doc_id")
      .withColumn("n", size(col("stoks")))
      .filter(col("n") > 0)
      .localCheckpoint()
    timed("docs materialize")(docs.count())

    val prefLen = (floor(lit(1.0 - threshold) * col("n")) + lit(2)).cast("int")
    val probes = docs.select(col("doc_id").as("a_id"), col("n").as("a_n"),
      col("stoks").as("a_toks"),
      explode(slice(col("rtoks"), lit(1), prefLen)).as("tok"))
    val index = docs.select(col("doc_id").as("b_id"), col("n").as("b_n"),
      col("stoks").as("b_toks"),
      posexplode(col("rtoks")).as(Seq("pos_b", "tok")))
    val bPrefixBound = col("pos_b") + 1 <=
      col("b_n") - floor(lit(threshold) * col("a_n")) + lit(2)
    val nParts = spark.sessionState.conf.numShufflePartitions
    val probesS = probes
      .withColumn("__salt", pmod(xxhash64(col("a_id")), lit(chunks)).cast("int"))
      .repartition(nParts, col("tok"), col("__salt"))
    val indexS = index
      .withColumn("__salt", explode(sequence(lit(0), lit(chunks - 1))))
      .repartition(nParts, col("tok"), col("__salt"))
    val joined = probesS.join(indexS,
      probesS("tok") === indexS("tok") &&
        probesS("__salt") === indexS("__salt") && bPrefixBound &&
        (col("a_n") < col("b_n") ||
          (col("a_n") === col("b_n") && col("a_id") < col("b_id"))))
    timed("candidate enumeration")(println("cands=" + joined.count()))
    val verified = joined
      .withColumn("inter",
        sortedIntersectAtLeastFracLeftLong(
          col("a_toks"), col("b_toks"), threshold))
      .withColumn("containment",
        col("inter").cast("double") / col("a_n").cast("double"))
      .filter(col("containment") >= threshold)
    timed("+ verify")(println("qual(dup)=" + verified.count()))
    val pairs = verified
      .select(col("a_id").as("doc_small"), col("b_id").as("doc_big"),
        col("containment"))
      .distinct()
    timed("+ distinct")(println("pairs=" + pairs.count()))
    val agg = pairs.groupBy(col("doc_small"))
      .agg(count(lit(1)).as("n_containers"),
        round(max(col("containment")), 6).as("best_containment"),
        min(col("doc_big")).as("first_container"))
      .orderBy(col("doc_small"))
    timed("+ aggregate")(println("rows=" + agg.count()))
    spark.stop()
  }
}
