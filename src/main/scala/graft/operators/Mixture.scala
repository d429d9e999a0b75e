package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixture resampling: downsample a corpus so each source
  * contributes a TARGET SHARE of the surviving tokens — the mixture
  * step of a pretraining pipeline ("30% web, 20% code, …"), restricted
  * to downsampling (no document is ever duplicated).
  *
  * Given shares w_g (summing to 1) and per-source token totals tok_g,
  * the largest feasible mixture size is T = min_g(tok_g / w_g) — the
  * binding source is kept whole (rate 1) and every other source is
  * thinned to rate_g = w_g * T / tok_g. Which documents survive is
  * decided by the same content-addressed coin as [[Sampling]]: a
  * 4-hex-digit md5 prefix of the id against floor(rate_g * 65536), so
  * the subset is identical on any engine or cluster size and is
  * reproducible from the id alone.
  *
  * Scale posture: pass 1 computes ~|sources| totals with a map-side
  * combined agg (tiny shuffle); the rate table (a window over
  * |sources| rows) broadcasts back; pass 2 is a map-only filter. The
  * corpus is scanned twice but never shuffled, never sorted — the
  * unavoidable price of learning the totals, and at 100 TB both
  * passes prune columns to (group, size) / (id, group) at the scan.
  *
  * Rates are IEEE doubles; both passes build the identical expression
  * tree the oracle mirrors, so the floor(·) integer thresholds agree
  * bit-for-bit across engines (binary64 ops are deterministic; only a
  * rate landing EXACTLY on a 1/65536 grid line could disagree, and the
  * binding source's exact 1.0 is clamped to 65535 on both sides —
  * the documented 1/65536 bias of the 4-digit encoding).
  */
object Mixture {

  /** Thin `docs` to the target mixture. `shares` lists (group value,
    * target share); groups NOT listed are dropped (share 0). Returns
    * the surviving rows plus `mix_rate` (the group's keep-rate).
    */
  def resampleToShares(docs: DataFrame, id: Column, group: Column,
                       size: Column, shares: Seq[(String, Double)])
      : DataFrame = {
    require(shares.nonEmpty, "shares must be non-empty")
    require(shares.forall(_._2 > 0), "shares must be positive")
    // A duplicate group name would put duplicate rows into `requested`
    // below; each survives the left join into `rates` and every doc of
    // that group would then be emitted once per duplicate — silently
    // breaking the no-duplication invariant. Fail loudly instead.
    require(shares.map(_._1).distinct.size == shares.size,
      s"duplicate group names in shares: ${shares.map(_._1)
        .groupBy(identity).collect { case (g, gs) if gs.size > 1 => g }
        .mkString(", ")}")
    val sumW = shares.map(_._2).sum
    require(math.abs(sumW - 1.0) < 1e-9,
      s"shares must sum to 1, got $sumW")
    val w = shares.foldLeft(lit(null).cast("double")) {
      case (acc, (g, s)) => when(lit(g) === col("mix_g"), lit(s))
        .otherwise(acc)
    }
    // Every requested group must contribute tokens: a misspelled (or
    // empty) source would otherwise silently drop out of the totals,
    // T would renormalize over the survivors, and the achieved shares
    // would quietly diverge from the request. The guard is in-plan
    // (zero extra jobs): the share list is the build side of a LEFT
    // join from the requested keys, so an absent group surfaces as a
    // null `tok` and assert_true throws on the caller's first action.
    val requested = docs.sparkSession
      .createDataFrame(shares.map(g => Tuple1(g._1)))
      .toDF("mix_g")
    val totals = requested
      .join(docs
        .select(group.cast("string").as("mix_g"),
          size.cast("long").as("sz"))
        .filter(col("mix_g").isin(shares.map(_._1): _*))
        .groupBy(col("mix_g")).agg(sum(col("sz")).as("tok")),
        Seq("mix_g"), "left")
      .filter(assert_true(col("tok").isNotNull && col("tok") > 0,
        concat(lit("Mixture.resampleToShares: requested group '"),
          col("mix_g"),
          lit("' has no tokens in the corpus — misspelled source " +
            "name or empty group"))).isNull)
      .withColumn("w", w)
    // T = min(tok/w) over the |sources|-row totals — an unpartitioned
    // window, but over a bounded catalog-sized frame, never the corpus
    val feasible = totals.withColumn("t_feas",
      min(col("tok") / col("w")).over(Window.partitionBy()))
    val rates = feasible.select(col("mix_g"),
      (col("w") * col("t_feas") / col("tok")).as("mix_rate"),
      least(floor(col("w") * col("t_feas") / col("tok") * 65536)
        .cast("long"), lit(65535L)).as("thr"))
    docs.withColumn("mix_g", group.cast("string"))
      .join(broadcast(rates), "mix_g")
      .filter(substring(md5(id.cast("string")), 1, 4)
        < lpad(lower(hex(col("thr"))), 4, "0"))
      .drop("mix_g", "thr")
  }
}
