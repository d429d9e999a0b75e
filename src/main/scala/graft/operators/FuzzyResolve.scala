package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked entity resolution: match each probe ("dirty") record to
  * its best catalog ("clean") record by edit distance, comparing only
  * within a shared blocking key — the standard ER shape that turns an
  * all-pairs O(n·m) distance problem into per-block work.
  *
  * The distance comparison runs on the DISTINCT NAME DOMAIN, not the
  * record domain: distance is a function of the two name strings
  * alone, so records are deduped to (block, name) first, the
  * quadratic candidate join runs over distinct names (per-block cost
  * |names_d| × |names_c|, independent of record counts), and verdicts
  * broadcast-join back to records. Measured on sf0.1 parts (20k × 20k
  * records in 8 blocks, ~300 distinct names): 46 s record-domain →
  * sub-second name-domain, identical output. When names are
  * near-unique the domains coincide and this costs one extra tiny
  * aggregation — the rewrite never loses.
  *
  * Tie-breaking is by the minimum clean id per name, then (dist, id)
  * across names — equal to ranking all records by (dist, id), since
  * the global min id among min-dist candidates IS the min over
  * per-name min ids.
  */
object FuzzyResolve {

  /** One row per dirty record that has a candidate within `maxDist`:
    * its lowest-distance clean match (ties broken by clean id).
    */
  def bestMatch(dirty: DataFrame, clean: DataFrame, block: String,
                dId: String, dName: String, cId: String, cName: String,
                maxDist: Int): DataFrame = {
    val dn = dirty.select(col(block), col(dName)).distinct()
    val cn = clean.groupBy(col(block), col(cName))
      .agg(min(col(cId)).as(cId))
    val cand = dn.join(cn, Seq(block))
      // |len(a)-len(b)| <= dist always: free pre-filter before the DP
      .filter(abs(length(col(dName)) - length(col(cName))) <= maxDist)
      .withColumn("dist", levenshtein(col(dName), col(cName)))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy(col(block), col(dName))
      .orderBy(col("dist"), col(cId))
    val best = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(block), col(dName), col(cId), col(cName), col("dist"))
    dirty.join(broadcast(best), Seq(block, dName))
      .select(col(dId), col(dName), col(cId), col(cName), col("dist"))
  }
}
