package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-addressed sampling for corpus curation.
  *
  * The sampling decision is a pure function of the row's id — no RNG,
  * no state, no shuffle: `md5(id)`'s first two hex digits are compared
  * against a threshold, so a row's fate is identical on every run,
  * every engine, and every cluster size (the property that makes
  * training-data subsets reproducible and incrementally extensible —
  * raising the threshold only ADDS rows, it never swaps them).
  * Lexicographic compare on the fixed-width lowercase prefix equals
  * numeric compare, so the same predicate runs verbatim in SQL oracles.
  *
  * Scale: embarrassingly parallel map-side filter; at 100 TB it
  * costs one pass and prunes before any downstream shuffle.
  */
object Sampling {

  /** Keep rows whose md5(id) prefix is below `threshold256`
    * (rate ≈ threshold256/256; e.g. 26 → ~10.2%).
    */
  def hashSample(df: DataFrame, id: Column, threshold256: Int): DataFrame = {
    require(threshold256 >= 0 && threshold256 <= 256,
      s"threshold256 must be in [0, 256], got $threshold256")
    df.filter(hashPrefix(id) < lit(f"$threshold256%02x"))
  }

  /** Per-stratum rates: each stratum keys its own threshold (unlisted
    * strata fall back to `default256`). One map-side filter — the
    * stratification costs nothing beyond the CASE.
    */
  def stratifiedHashSample(df: DataFrame, id: Column, stratum: Column,
                           rates256: Seq[(String, Int)],
                           default256: Int): DataFrame = {
    val th = rates256.foldLeft(lit(f"$default256%02x")) {
      case (acc, (k, r)) => when(stratum === k, lit(f"$r%02x")).otherwise(acc)
    }
    df.filter(hashPrefix(id) < th)
  }

  /** Deterministic WEIGHTED Bernoulli sample: row kept with
    * probability `weight / weightScale` (clamped to 1), decided by
    * comparing a 4-hex-digit md5 prefix of the id against the
    * per-row threshold `weight * 65536 / weightScale` rendered as
    * 4 lowercase hex digits. Same rows on any engine or cluster
    * size, zero shuffle — the quality-score-proportional curation
    * sampler (heavier rows survive proportionally more often).
    */
  def weightedHashSample(df: DataFrame, id: Column, weight: Column,
                         weightScale: Int): DataFrame = {
    require(weightScale > 0, s"weightScale must be > 0, got $weightScale")
    // clamp to [0, 0xffff]: above, 5 hex digits would break the
    // fixed-width string compare (a full-probability row keeps
    // 65535/65536 of the time, the documented bias of the encoding);
    // below, hex() of a negative long renders 16 two's-complement
    // digits whose 4-char prefix is "ffff" — a negative weight would
    // keep the row ~always instead of never
    val thr = least(greatest((weight * 65536 / weightScale).cast("long"),
      lit(0L)), lit(65535L))
    df.filter(substring(md5(id.cast("string")), 1, 4)
      < lpad(lower(hex(thr)), 4, "0"))
  }

  private def hashPrefix(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)
}
