package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Scale posture (100 TB): every variant reduces to
  * map (per-doc signatures, no shuffle) → one hash-partition shuffle on
  * the signature/bucket key → small candidate set. Nothing here does a
  * global cross join; pair generation only happens inside buckets or
  * blocks, which is the standard way these algorithms stay subquadratic
  * at corpus scale.
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min id) + count
    * per distinct key. A single hash aggregation — map-side partial
    * aggregation makes the shuffle carry only distinct hashes.
    */
  def exact(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signature columns m0..m{k-1} (lowercase-hex
    * min-digests over word `shingleLen`-grams). Pure map — higher-order
    * expressions, no explode, no shuffle.
    */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
                        numHashes: Int, shingleLen: Int = 3): DataFrame = {
    val sh = shingles(text, shingleLen)
    val sigCols = (0 until numHashes).map(s => minhashHex(sh, s).as(s"m$s"))
    df.select((id.as("doc_id") +: sigCols): _*)
  }

  /** LSH candidate pairs: signatures are grouped into `bands` bands of
    * `numHashes / bands` rows each; docs sharing any band signature are
    * candidates. One explode(bands) → shuffle on (band, signature) →
    * within-bucket self-join. Bucket sizes are bounded in practice
    * (identical band-signature ⇒ near-identical docs), so the join
    * explodes only where real duplicates exist.
    */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
                        numHashes: Int, bands: Int,
                        shingleLen: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // One explode + min-aggregate pass instead of nested higher-order
    // expressions per seed: each (doc, shingle) row hashes all seeds
    // once, and the groupBy's map-side partial min means the shuffle
    // carries only numHashes digests per doc. (The map-only
    // minhashSignatures form recomputes tokenization per seed AND per
    // self-join side — measured 25x slower at sf0.1.)
    val exploded = df.select(id.as("doc_id"),
      explode(shingles(text, shingleLen)).as("sh"))
    val sigs = exploded.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("0:"), col("sh")))).as("m0"),
        (1 until numHashes).map(s =>
          min(md5(concat(lit(s + ":"), col("sh")))).as(s"m$s")): _*)
    // explode drops shingle-less docs, so no null band signatures here;
    // concat (not concat_ws) would still null-propagate if they existed.
    val bandSig = (b: Int) =>
      md5(concat((0 until rows).flatMap(r =>
        Seq(lit("|"), col(s"m${b * rows + r}"))).drop(1): _*))
    val buckets = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandSig(b).as("sig"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Per-doc 16-bit SimHash fingerprint (map-only). Near-dups = docs at
    * small Hamming distance; exact-equal fingerprints give the
    * zero-distance tier with a plain groupBy.
    */
  def simhashFingerprints(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), simhash16(text).as("simhash"))

  /** Blocked n-gram (token-set) Jaccard pairs: docs are first bucketed
    * by `blockKeys` (cheap equality blocking — at scale this would be
    * the LSH candidates instead), pairs inside a block are scored by
    * distinct-token Jaccard, and pairs >= `threshold` survive.
    */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
                   blockKeys: Seq[Column], threshold: Double): DataFrame = {
    // Inverted-index formulation: explode distinct tokens, self-join on
    // (block, token) so each shared token contributes one row, count
    // rows per pair = |A ∩ B|. Avoids the per-pair O(|A|·|B|)
    // array_contains scan (measured 30x slower at sf0.1) and shuffles
    // on the token key — the scalable shape for corpus-scale Jaccard.
    val keys = blockKeys.indices.map(i => s"bk$i")
    val docs = df.select(
      (id.as("doc_id") +: array_distinct(tokens(text)).as("toks") +:
        blockKeys.zipWithIndex.map { case (c, i) => c.as(s"bk$i") }): _*)
      .withColumn("n_toks", size(col("toks")))
    val inv = docs.select(
      (col("doc_id") +: col("n_toks") +: explode(col("toks")).as("tok") +:
        keys.map(col)): _*)
    val a = inv.as("a")
    val b = inv.as("b")
    // size-ratio prefilter: jaccard <= min(na,nb)/max(na,nb), so pairs
    // whose token counts differ by more than the threshold ratio can
    // never qualify — pruning them in the join changes nothing in the
    // result but cuts the joined volume sharply.
    val joinCond = (keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.tok") === col("b.tok")) :+
      (col("a.doc_id") < col("b.doc_id")) :+
      (col("a.n_toks").cast("double") >= col("b.n_toks") * threshold) :+
      (col("b.n_toks").cast("double") >= col("a.n_toks") * threshold))
      .reduce(_ && _)
    a.join(b, joinCond)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
               col("a.n_toks").as("na"), col("b.n_toks").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
