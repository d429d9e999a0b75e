package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.expressions.CustomExpressions._

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
    // custom MultiMinHash expression: one pass over the token array
    // (shingles built internally in a reused buffer) for all seeds —
    // same values as the per-seed array_min(transform(md5)) over
    // shingles() composition, an order of magnitude cheaper
    val withSig = df.select(id.as("doc_id"),
      multiMinHash(tokens(text), numHashes, shingleLen).as("sig"))
    val sigCols = (0 until numHashes)
      .map(s => element_at(col("sig"), s + 1).as(s"m$s"))
    withSig.select((col("doc_id") +: sigCols): _*)
  }

  /** Banded LSH bucket table (doc_id, band, sig): the map-only
    * signature pipeline plus the per-band md5 — the "index rows" every
    * LSH variant (self-dedup, incremental dedup) shuffles or probes
    * on. Shingle-less docs null their band signatures and are dropped
    * (they can never be near-dup candidates).
    */
  def bandedBuckets(df: DataFrame, id: Column, text: Column,
                    numHashes: Int, bands: Int,
                    shingleLen: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, id, text, numHashes, shingleLen)
    // concat (not concat_ws): a null minhash (shingle-less doc) must
    // null the band signature, or every empty doc lands in one bucket.
    val bandSig = (b: Int) =>
      md5(concat((0 until rows).flatMap(r =>
        Seq(lit("|"), col(s"m${b * rows + r}"))).drop(1): _*))
    sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandSig(b).as("sig"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
      // shingle-less docs have null band signatures — never candidates
      .filter(col("sig").isNotNull)
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
    val buckets = bandedBuckets(df, id, text, numHashes, bands, shingleLen)
    // Aggregate each bucket's members and generate the i<j pairs from
    // the sorted member array IN the expression layer. A bucket
    // self-join would recompute the whole signature pipeline for both
    // sides (measured ~2x the runtime); here signatures are computed
    // once and the shuffle carries one row per (band, sig).
    val pairs = buckets
      .groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_list(col("doc_id"))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(flatten(transform(col("members"), (x, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
    pairs.groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Incremental dedup: adjudicate a NEW batch (`delta`) against an
    * already-deduplicated corpus (`base`) without ever re-deduplicating
    * the corpus — the operation a standing pipeline runs per crawl.
    * Returns one row per delta doc: `base_match` (min base doc sharing
    * an LSH band, null if none), `delta_match` (min EARLIER delta doc
    * sharing a band — first-wins within the batch), and `is_new`.
    *
    * Scale posture: the corpus side is index-shaped — its banded
    * bucket rows are map-only to compute, and in production are
    * materialized ONCE via `writeBucketIndex` and probed per batch via
    * `incrementalDedupIndexed` (measured, graft.AbIncDedup at sf1:
    * probe-only 2.1 s vs recompute-per-batch 10.4 s — the index scan
    * is ~100× cheaper than signature recompute, break-even after two
    * batches; PLANS.md "q109 index"). Recomputing here keeps the
    * oracled query self-contained. The day's batch buckets BROADCAST
    * into the base probe, so the 100 TB side is a map-only scan with
    * zero shuffle; only the hit set (bounded by |delta| × bands) and
    * the batch-internal self-join shuffle.
    */
  def incrementalDedup(base: DataFrame, delta: DataFrame,
                       id: Column, text: Column,
                       numHashes: Int, bands: Int,
                       shingleLen: Int = 3,
                       broadcastBatch: Option[Boolean] = None): DataFrame =
    incrementalDedupIndexed(
      bandedBuckets(base, id, text, numHashes, bands, shingleLen),
      delta, id, text, numHashes, bands, shingleLen, broadcastBatch)

  /** Materialize the corpus's banded bucket rows once — the
    * production shape of the incremental path: the standing corpus's
    * minhash pipeline runs at ingest (or one backfill), and every
    * daily batch probes the INDEX, never re-reading corpus text.
    * Plain parquet, no layout requirement: in the probe join the
    * index side is a map-only scan (the batch broadcasts into it),
    * so no partitioning of the index can be exploited anyway.
    */
  def writeBucketIndex(base: DataFrame, id: Column, text: Column,
                       numHashes: Int, bands: Int, path: String,
                       shingleLen: Int = 3): Unit =
    bandedBuckets(base, id, text, numHashes, bands, shingleLen)
      .write.mode("overwrite").parquet(path)

  /** Read a `writeBucketIndex` layout back as the base side of
    * `incrementalDedupIndexed`.
    */
  def readBucketIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    graft.Tables.readCached(spark, path)

  /** `incrementalDedup` against an already-computed corpus bucket
    * index (from `writeBucketIndex`/`readBucketIndex`, or any frame
    * with (doc_id, band, sig) rows). The batch's buckets are computed
    * fresh — the batch is the small, new side — and probe the index.
    */
  def incrementalDedupIndexed(baseBk: DataFrame, delta: DataFrame,
                              id: Column, text: Column,
                              numHashes: Int, bands: Int,
                              shingleLen: Int = 3,
                              broadcastBatch: Option[Boolean] = None)
      : DataFrame = {
    // r21 note: checkpointing these batch bucket rows (three
    // consumers: the index probe + both sides of the batch-internal
    // self-join) was tried and REVERTED — the LogicalRDD barrier
    // erases the size estimates that let the final left joins
    // broadcast their agg sides, and the lost broadcasts cost more
    // than the saved signature recompute at every batch size measured
    // (q109 solo 0.26 -> 0.58 s eager / 0.64 s lazy at sf0.1). The
    // batch is the small side by contract, so its recompute is two
    // extra map-only passes.
    val deltaBk = bandedBuckets(delta, id, text, numHashes, bands,
      shingleLen)
    // Broadcast the delta buckets only when Catalyst's size estimate
    // says they fit the session's broadcast threshold; an oversized
    // "batch" (someone reprocessing a month at once) then degrades to
    // a shuffled hash join on (band, sig) instead of failing on the
    // driver/broadcast limit. conf "-1" (broadcast disabled) also
    // routes to the shuffle path.
    // Read through sessionState.conf, not a raw string parse:
    // JavaUtils.byteStringAsBytes rejects "-1" (the standard value for
    // "broadcast disabled"), so parsing the string here would crash
    // exactly when the user asked for the shuffle path. The typed
    // accessor returns Long and handles -1.
    // `broadcastBatch` overrides the estimate in either direction:
    // stats on a freshly-computed bucket frame are estimates, and a
    // pathological misestimate must not broadcast an oversized batch
    // (Some(false)) or shuffle a tiny one (Some(true)) — the operator,
    // not the planner, is accountable for the degrade path.
    val bcThreshold: Long =
      baseBk.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    lazy val deltaBytes =
      deltaBk.queryExecution.optimizedPlan.stats.sizeInBytes
    val doBroadcast = broadcastBatch.getOrElse(
      bcThreshold >= 0 && deltaBytes <= bcThreshold)
    val probeSide =
      if (doBroadcast) broadcast(deltaBk.as("d"))
      else if (broadcastBatch.contains(false))
        // an explicit opt-out must beat the planner's auto-broadcast,
        // not just drop the hint — pin the shuffled hash join
        deltaBk.as("d").hint("shuffle_hash")
      else deltaBk.as("d")
    val baseHits = baseBk.as("b")
      .join(probeSide, Seq("band", "sig"))
      .groupBy(col("d.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("base_match"))
    val deltaHits = deltaBk.as("d")
      .join(deltaBk.as("e"), col("d.band") === col("e.band")
        && col("d.sig") === col("e.sig")
        && col("e.doc_id") < col("d.doc_id"))
      .groupBy(col("d.doc_id").as("doc_id"))
      .agg(min(col("e.doc_id")).as("delta_match"))
    delta.select(id.cast("long").as("doc_id"))
      .join(baseHits, Seq("doc_id"), "left")
      .join(deltaHits, Seq("doc_id"), "left")
      .withColumn("is_new",
        col("base_match").isNull && col("delta_match").isNull)
  }

  /** Per-doc 16-bit SimHash fingerprint (map-only). Near-dups = docs at
    * small Hamming distance; exact-equal fingerprints give the
    * zero-distance tier with a plain groupBy.
    */
  def simhashFingerprints(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), simhash16(text).as("simhash"))

  /** Span-level duplicate statistics — the fixed-granularity
    * relational form of exact-substring dedup (Lee et al. 2022,
    * arXiv:2107.06499): every sliding `windowLen`-token window of
    * every document is hashed POSITIONALLY (duplicates kept — a span
    * repeated within one document is still a duplicated span), a
    * window is duplicated when its hash occurs more than once in the
    * whole corpus, and each document reports how much of it is
    * made of duplicated spans. Downstream curation drops or trims
    * documents by `dup_ratio` instead of whole-doc near-dup equality —
    * the signal that catches boilerplate headers, licence blocks and
    * quoted reposts that document-level MinHash misses.
    *
    * Output: one row per doc — `n_windows`, `n_dup_windows`,
    * `dup_ratio` (null when the doc is shorter than the window).
    *
    * Scale shape (100 TB): map-only window hashing (one-pass
    * [[graft.functions.expressions.WindowMd5]]; hashes travel as
    * fixed 32-byte md5 hex, never raw text) → one map-side-combinable
    * hash aggregation on the window hash (the shuffle carries
    * distinct hashes with counts, not occurrences) → a join back on
    * the hash to re-attach per-position rows (AQE broadcasts the
    * count table when it is small and skew-splits the boilerplate
    * hot keys — a window shared by millions of docs skews the JOIN
    * key, not the aggregation, which combined map-side) → final
    * per-doc aggregation. No pair table is ever materialized: unlike
    * pairwise dedup this is linear in corpus size by construction.
    */
  def dupSpanStats(df: DataFrame, id: Column, text: Column,
                   windowLen: Int): DataFrame = {
    import graft.functions.expressions.WindowMd5.windowMd5
    val exploded = df
      .select(id.as("doc_id"),
        explode_outer(windowMd5(tokens(text), windowLen)).as("whash"))
    val counts = exploded
      .filter(col("whash").isNotNull)
      .groupBy(col("whash"))
      .agg(count(lit(1)).as("occ"))
    exploded
      .join(counts, Seq("whash"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("whash")).as("n_windows"),
        count(when(col("occ") > 1, lit(1))).as("n_dup_windows"))
      .withColumn("dup_ratio",
        when(col("n_windows") > 0,
          round(col("n_dup_windows").cast("double")
            / col("n_windows"), 9)))
  }

  /** Blocked n-gram (token-set) Jaccard pairs: docs are first bucketed
    * by `blockKeys` (cheap equality blocking — at scale this would be
    * the LSH candidates instead), pairs inside a block are scored by
    * distinct-token Jaccard, and pairs >= `threshold` survive.
    *
    * `chunks` is the skew knob, delegated to [[TrianglePairs]]: the
    * blocking keys are low cardinality (a language × length-bucket
    * scheme yields tens of blocks), so without salting the biggest
    * block's quadratic pair scan runs single-threaded — measured 211 s
    * at sf1 (~19k docs, ~176M candidate pairs in one block against 10
    * join-key values), 15 s salted.
    */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
                   blockKeys: Seq[Column], threshold: Double,
                   chunks: Int = 16): DataFrame = {
    // Block-equi join on the blocking keys, then one merge scan per
    // candidate pair over SORTED distinct token arrays (custom
    // SortedIntersectCount expression). Compared at sf0.1: 30x faster
    // than per-pair array_contains scans, 2x faster than an
    // inverted-index token self-join (which shuffles |pairs| x |shared
    // tokens| rows); here the only shuffled rows are the docs
    // themselves, ~chunks/2 times per block.
    val keys = blockKeys.indices.map(i => s"bk$i")
    // tokens collapse to sorted 64-bit hashes: the join then moves
    // compact long arrays instead of fat string arrays, and the merge
    // scan compares integers (xxhash64 collisions at ~2^-64 per pair
    // are the standard trade in production dedup pipelines)
    val docs = df.select(
      (id.as("doc_id") +:
        array_sort(transform(array_distinct(tokens(text)),
          t => xxhash64(t))).as("toks") +:
        blockKeys.zipWithIndex.map { case (c, i) => c.as(s"bk$i") }): _*)
      .withColumn("n_toks", size(col("toks")))
    // Second blocking key: token-count log-bucket, width 1/threshold.
    // jaccard >= t forces min(na,nb)/max(na,nb) >= t, so qualifying
    // pairs sit in the same or adjacent buckets — saltedAdjacent makes
    // that part of the join's EQUI key, so the quadratic in-block
    // candidate enumeration (the one super-linear cost left at sf3)
    // skips non-adjacent-size pairs instead of generating them for the
    // ratio predicate to kill. Threshold edges: t >= 1 degenerates to
    // exact-size buckets; t <= 0 admits every ratio, so everything
    // lands in one bucket and the key is a no-op — both still exact.
    val bucket =
      if (threshold >= 1.0) greatest(col("n_toks"), lit(1))
      else if (threshold <= 0.0) lit(0L)
      else floor(
        log(greatest(col("n_toks"), lit(1)).cast("double")) /
          math.log(1.0 / threshold))
    val (a, b, keyCond) =
      TrianglePairs.saltedAdjacent(docs, "doc_id", keys, bucket, chunks)
    // size-ratio prefilter: jaccard <= min(na,nb)/max(na,nb), so pairs
    // whose token counts differ by more than the threshold ratio can
    // never qualify — pruning them in the join changes nothing in the
    // result but cuts the candidate volume.
    val joinCond = keyCond &&
      TrianglePairs.orderedOnce(col("a.doc_id"), col("b.doc_id")) &&
      (col("a.n_toks").cast("double") >= col("b.n_toks") * threshold) &&
      (col("b.n_toks").cast("double") >= col("a.n_toks") * threshold)
    a.join(b, joinCond)
      // threshold-aware intersect: codegen'd merge scan that aborts
      // (returning -1, hence a negative jaccard that self-filters)
      // once the remaining elements can't reach the threshold — the
      // per-candidate constant is the whole cost of the verify phase
      .withColumn("inter",
        sortedIntersectAtLeastLong(col("a.toks"), col("b.toks"), threshold))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("a.n_toks") + col("b.n_toks") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
              col("jaccard"))
  }

  /** Asymmetric CONTAINMENT near-dup: pairs where the smaller doc's
    * distinct-token set is >= `threshold` contained in the larger's
    * (`|A∩B| / |A|`, |A| <= |B|) — the quote/embedded-copy case that
    * Jaccard structurally misses (a 20-token doc fully quoted inside a
    * 500-token doc has jaccard 0.04 but containment 1.0). Because the
    * two sides may differ arbitrarily in size, q45's length-bucket
    * adjacency pruning does NOT apply; candidates come from SSJoin/
    * PPJoin-style PREFIX FILTERING instead (Chaudhuri et al. SSJoin
    * 2006; Xiao et al. PPJoin 2011): order each doc's tokens by global
    * rarity (document frequency, then hash — a total order both sides
    * agree on); if the smaller side shares >= t·|A| tokens, its first
    * `floor((1-t)·|A|) + 2` rarest tokens cannot ALL be unshared, so
    * probing only that prefix against the corpus inverted index finds
    * every qualifying pair (+2 absorbs the double-threshold rounding —
    * an over-long prefix only adds candidates, never drops pairs).
    *
    * Scale: per-doc work is map-only; the shuffles are the token-df
    * aggregation (map-side combined, Zipf skew absorbed by partial
    * aggregation), the inverted-index equi-join on the token key —
    * where rarity ordering is precisely what keeps hot tokens out of
    * the probe side's prefixes, so a stop-word's huge postings list
    * meets few probes — and the candidate-pair dedup. The verify phase
    * is the same codegen'd sorted-merge intersect as q45.
    *
    * Scale CEILING (measured, PLANS.md r19): exact all-pairs
    * containment is Θ(n²/V) candidates at fixed vocabulary V — probes
    * and every token's postings both grow ~n, so the prefix filter
    * buys the 1/V constant, never the exponent (candidate exponent
    * 1.99 on the realistic 30k-vocab fixtures, replayed exactly in
    * DuckDB incl. the positional bound; pair keys cut candidates 15×
    * but need an O(|b|²) index — rejected). Heaps' law softens real
    * corpora to ~n^1.5. At corpus scale run this operator
    * INCREMENTALLY (probe new batches against a corpus index, the
    * q109/q122 pattern — per-batch cost linear in corpus size) or
    * behind a first-stage near-dup blocking; as an all-pairs batch
    * it is a bounded-corpus / per-cluster operator.
    */
  def containmentPairs(df: DataFrame, id: Column, text: Column,
                       threshold: Double, chunks: Int = 32): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(chunks >= 1, "chunks must be >= 1")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    // distinct token hashes per doc (compact longs, as in jaccardPairs)
    val toks = distinctTokenHashes(df, id, text)
    val expl = toks.select(col("doc_id"), explode(col("th")).as("tok"))
    val dfreq = expl.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    // rarity order: (df ASC, hash ASC) — struct array_sort is
    // field-lexicographic, giving the identical total order everywhere
    // r22: the r21 repartition+localCheckpoint of the 4-consumer docs
    // table was REVERTED on the driver's ground truth (q115 3.5 ->
    // 23.1 s at 32 cores, core-scaling ratio 0.30 — the eager
    // materialization runs inside the timed region on every per-rep
    // reconstruction and its block-manager churn anti-scales with
    // cores; the host it was validated on had an expensive recompute,
    // the driver host a cheap one). The recompute is cut STRUCTURALLY
    // instead:
    //  - the verify-side small/big re-attaches derive from the
    //    map-only `toks` subtree (they only need hash-sorted arrays —
    //    the dfreq+rarity chain they used to ride through was pure
    //    recompute; rarity membership == size(th) > 0, so the rows
    //    are identical);
    //  - probes and index both consume `docs` with the IDENTICAL
    //    (doc_id, n, rtoks) projection — n is size(rtoks), not
    //    size(stoks) (same value: rtoks is a permutation of stoks) —
    //    so the rarity aggregation's exchange canonicalizes equal
    //    under both consumers and ReuseExchange shares the whole
    //    scan+tokenize+df-count subtree under it instead of a
    //    materialization barrier (the q130 pattern).
    val docs = expl.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok"))))
        .as("rt"))
      .select(col("doc_id"),
        transform(col("rt"), s => s.getField("tok")).as("rtoks"))
      .withColumn("n", size(col("rtoks")))
    // Prefix probe side: the floor((1-t)n)+2 rarest tokens of each doc.
    // Both join sides are SKINNY — (id, n, tok[, pos]) longs only; the
    // token arrays do NOT ride through the candidate join (round 15 —
    // the r14 advisor measured the array-carrying index explode as the
    // pipeline's largest shuffle, O(chunks × Σ|doc|²) bytes). They are
    // re-attached AFTER candidate dedup, so each doc's array is
    // shuffled once, not once per (position × salt).
    val prefLen =
      (floor(lit(1.0 - threshold) * col("n")) + lit(2)).cast("int")
    val probes = docs.select(col("doc_id").as("a_id"), col("n").as("a_n"),
      explode(slice(col("rtoks"), lit(1), prefLen)).as("tok"))
    val index = docs.select(col("doc_id").as("b_id"), col("n").as("b_n"),
      posexplode(col("rtoks")).as(Seq("pos_b", "tok")))
    // Both-prefix lemma (Bayardo et al. WWW'07): the FIRST shared token
    // in the global rarity order sits inside BOTH sides' prefixes, so
    // the index side only needs positions <= n_b - ceil(t*n_a) + 1;
    // floor()+2 is the fp-safe slack, mirroring the probe side.
    val bPrefixBound =
      col("pos_b") + 1 <=
        col("b_n") - floor(lit(threshold) * col("a_n")) + lit(2)
    // The token key is LOW-CARDINALITY (a vocabulary, Zipf-headed) and
    // the shuffled rows are tiny in bytes while the downstream pair
    // enumeration is quadratic — exactly the shape AQE's byte-based
    // coalescing funnels onto one thread (the round-10 q45/q57
    // lesson). Salt the FULL-token index side by doc hash and
    // replicate the PREFIX probe side across all salts — the probe
    // explode is the (1-t)-fraction side, so replicating it costs
    // ~(1-t)·chunks·Σ|doc| skinny rows where replicating the index
    // would cost chunks·Σ|doc| — and pin a fixed-count repartition on
    // (tok, salt) that AQE may not coalesce.
    val probesS = probes
      .withColumn("__salt", explode(sequence(lit(0), lit(chunks - 1))))
      .repartition(nParts, col("tok"), col("__salt"))
    val indexS = index
      // the outer coalesce keeps this salt NON-NULLABLE (Pmod is
      // nullable by type whatever its inputs — div-by-zero semantics
      // — and a literal chunks >= 1 never trips it): same value for
      // every row, but without it the join's inferred isnotnull(salt)
      // pushes to the index-side SCAN only, making the two rarity-agg
      // exchange subtrees canonically different — which is exactly
      // what blocks the ReuseExchange sharing the comment above
      // `docs` relies on.
      .withColumn("__salt",
        coalesce(pmod(xxhash64(col("b_id")), lit(chunks)), lit(0L))
          .cast("int"))
      .repartition(nParts, col("tok"), col("__salt"))
    val candidates = probesS.join(indexS,
        probesS("tok") === indexS("tok") &&
          probesS("__salt") === indexS("__salt") && bPrefixBound &&
          (col("a_n") < col("b_n") ||
            (col("a_n") === col("b_n") && col("a_id") < col("b_id"))))
      // a candidate surfaces once per shared prefix token; dedup the
      // skinny (a,b) pairs BEFORE attaching arrays and verifying, so
      // the merge scan runs once per pair, not once per occurrence
      .select(col("a_id"), col("b_id"))
      .distinct()
    // verify-side arrays from the map-only tokenize subtree (one scan
    // each, no shuffle): same rows as the old docs join — rarity
    // membership is exactly size(th) > 0
    val sorted = toks
      .select(col("doc_id"), array_sort(col("th")).as("stoks"))
      .withColumn("n", size(col("stoks")))
      .filter(col("n") > 0)
    val small = sorted.select(col("doc_id").as("a_id"), col("n").as("a_n"),
      col("stoks").as("a_toks"))
    val big = sorted.select(col("doc_id").as("b_id"),
      col("stoks").as("b_toks"))
    candidates
      .join(small, "a_id")
      .join(big, "b_id")
      // codegen'd merge scan with containment-target early exit (the
      // -1 abort makes the computed containment negative: self-filters)
      .withColumn("inter",
        sortedIntersectAtLeastFracLeftLong(
          col("a_toks"), col("b_toks"), threshold))
      .withColumn("containment",
        col("inter").cast("double") / col("a_n").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("a_id").as("doc_small"), col("b_id").as("doc_big"),
        col("containment"))
  }

  /** The three tables of a standing containment index (see
    * [[writeContainmentIndex]]): corpus document frequencies (the
    * frozen rarity order every batch agrees on), the rarity-ordered
    * positional postings both probe directions scan, and the
    * hash-sorted per-doc token arrays the exact verify phase needs.
    */
  final case class ContainmentIndex(dfreq: DataFrame, postings: DataFrame,
                                    docs: DataFrame)

  /** Distinct token hashes per doc — the shared map-only front of the
    * containment operators: (doc_id, th: array<long>).
    */
  private def distinctTokenHashes(df: DataFrame, id: Column,
                                  text: Column): DataFrame =
    df.select(id.as("doc_id"),
      array_distinct(transform(tokens(text), t => xxhash64(t))).as("th"))

  /** Materialize the standing-corpus side of INCREMENTAL containment
    * dedup once — the form [[containmentPairs]]'s own scale analysis
    * prescribes (exact all-pairs containment is Θ(n²/V) by problem
    * structure; the incremental form pays per-batch cost linear in the
    * corpus). Three parquet tables under `path`:
    *  - `dfreq`    (tok, tdf): corpus document frequencies — the
    *    FROZEN total rarity order (tdf ASC, tok ASC) every future
    *    batch orders by, so corpus postings never re-sort;
    *  - `postings` (doc_id, n, pos, tok): each corpus doc's distinct
    *    token hashes posexploded in rarity order — the inverted index;
    *    prefix rows are the `pos`-filtered subset, so one table serves
    *    both probe directions;
    *  - `docs`     (doc_id, n, stoks): hash-sorted token arrays for
    *    the exact-verify merge scan.
    * One-time offline build (three actions re-scan the corpus text —
    * a backfill cost, not a per-batch one); plain unpartitioned
    * parquet, same rationale as [[writeBucketIndex]]: the batch side
    * broadcasts into the probe joins, so no index layout could be
    * exploited anyway.
    */
  def writeContainmentIndex(corpus: DataFrame, id: Column, text: Column,
                            path: String): Unit = {
    val toks = distinctTokenHashes(corpus, id, text)
    val expl = toks.select(col("doc_id"), explode(col("th")).as("tok"))
    expl.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      .write.mode("overwrite").parquet(path + "/dfreq")
    // read the materialized df table back rather than recomputing the
    // vocabulary aggregation inside the postings plan
    val dfreq = graft.Tables.readCached(corpus.sparkSession, path + "/dfreq")
    val rarity = expl.join(dfreq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok"))))
        .as("rt"))
      .select(col("doc_id"),
        transform(col("rt"), s => s.getField("tok")).as("rtoks"))
    // r22: the r21 checkpoint-shared docs table is gone with the q115
    // revert (same driver-ground-truth rationale — see
    // containmentPairs). The two write ACTIONS never needed a shared
    // chain: the docs table only needs the map-only tokenize subtree
    // (rarity membership == size(th) > 0, so the rows are identical),
    // and the postings write is the only consumer of the rarity sort.
    // Build cost is the same two tokenize passes the checkpoint form
    // paid (dfreq's write is pass one), minus the checkpoint
    // materialization job and its non-fault-tolerant blocks — on a
    // real cluster each write is independently lineage-recoverable.
    rarity
      .withColumn("n", size(col("rtoks")))
      .select(col("doc_id"), col("n"),
        posexplode(col("rtoks")).as(Seq("pos", "tok")))
      .write.mode("overwrite").parquet(path + "/postings")
    toks
      .select(col("doc_id"), array_sort(col("th")).as("stoks"))
      .withColumn("n", size(col("stoks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("stoks"))
      .write.mode("overwrite").parquet(path + "/docs")
  }

  /** Read a [[writeContainmentIndex]] layout back. */
  def readContainmentIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String): ContainmentIndex =
    ContainmentIndex(
      graft.Tables.readCached(spark, path + "/dfreq"),
      graft.Tables.readCached(spark, path + "/postings"),
      graft.Tables.readCached(spark, path + "/docs"))

  /** Incremental containment dedup: all pairs (doc_small, doc_big,
    * containment >= threshold) with one side in the NEW batch and the
    * other in the indexed corpus — [[containmentPairs]] restricted to
    * batch×corpus pairs (pinned equal in OperatorsSpec), without ever
    * re-enumerating corpus×corpus. Both orientations are found: a new
    * doc contained in corpus content AND corpus docs contained in the
    * new doc.
    *
    * Same SSJoin/PPJoin prefix-filter completeness as the batch form,
    * under the CORPUS's frozen rarity order (batch tokens the corpus
    * has never seen get tdf 0 — rarest; they can match nothing, and
    * the prefix lemma holds under ANY total order both sides share,
    * so freezing the statistic loses no pairs — the verify phase is
    * exact either way).
    *
    * Scale posture (the point of the operator): per-batch cost is
    * LINEAR in corpus size — direction 1 streams the postings scan
    * past the broadcast batch prefixes, direction 2 streams the
    * pos-filtered prefix subset of the same scan past the broadcast
    * batch postings; the corpus is never shuffled and never joined to
    * itself, which is where the batch form's Θ(n²/V) lives. The only
    * vocabulary-sized work is the tdf attach (one equi-join against
    * `dfreq` per batch). An oversized batch (someone replaying a month
    * as one "batch") degrades to the salted shuffle joins of
    * [[containmentPairs]] instead of failing on the broadcast limit;
    * `broadcastBatch` overrides the size estimate in either direction,
    * same accountability contract as [[incrementalDedupIndexed]].
    *
    * Measured contract (AbIncContainment, PLANS.md r20): built for
    * batches ≪ corpus — at a fixed 5 k-doc batch the probe is 2.4×
    * faster than the all-pairs form at realdocs_sf3 and grows
    * sublinearly with the corpus; at batch = 10% of the corpus the
    * advantage is gone (the degrade path's replication costs what the
    * avoided corpus×corpus enumeration saved). A corpus-sized replay
    * belongs on [[containmentPairs]], per-cluster.
    */
  def containmentProbeIncremental(index: ContainmentIndex,
                                  batch: DataFrame, id: Column,
                                  text: Column, threshold: Double,
                                  chunks: Int = 32,
                                  broadcastBatch: Option[Boolean] = None)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(chunks >= 1, "chunks must be >= 1")
    val toks = distinctTokenHashes(batch, id, text)
    val expl = toks.select(col("doc_id"), explode(col("th")).as("tok"))
    // rarity order under the corpus's frozen statistics; unseen
    // tokens coalesce to tdf 0 (sort first, match nothing)
    val rarity = expl.join(index.dfreq, Seq("tok"), "left")
      .withColumn("tdf", coalesce(col("tdf"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok"))))
        .as("rt"))
      .select(col("doc_id"),
        transform(col("rt"), s => s.getField("tok")).as("rtoks"))
    val bdocs = toks
      .select(col("doc_id"), array_sort(col("th")).as("stoks"))
      .join(rarity, "doc_id")
      .withColumn("n", size(col("stoks")))
      .filter(col("n") > 0)
    // size-gate on the compact per-doc frame (the exploded probe and
    // postings forms below are the same magnitude in bytes — one long
    // per token either way)
    val bcThreshold: Long =
      batch.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    lazy val batchBytes =
      bdocs.queryExecution.optimizedPlan.stats.sizeInBytes
    val doBroadcast = broadcastBatch.getOrElse(
      bcThreshold >= 0 && batchBytes <= bcThreshold)
    val nParts =
      batch.sparkSession.sessionState.conf.numShufflePartitions
    val prefLen =
      (floor(lit(1.0 - threshold) * col("n")) + lit(2)).cast("int")
    // ---- direction 1: batch doc is the SMALL side ----
    // batch prefixes probe the corpus postings; the index side's
    // positional bound is the both-prefix lemma, as in the batch form
    val bprobe = bdocs.select(col("doc_id").as("a_id"),
      col("n").as("a_n"),
      explode(slice(col("rtoks"), lit(1), prefLen)).as("tok"))
    val cpost = index.postings.select(col("doc_id").as("b_id"),
      col("n").as("b_n"), col("pos").as("pos_b"), col("tok"))
    val sizeOrder = col("a_n") < col("b_n") ||
      (col("a_n") === col("b_n") && col("a_id") < col("b_id"))
    val bBound = col("pos_b") + 1 <=
      col("b_n") - floor(lit(threshold) * col("a_n")) + lit(2)
    val cand1 =
      if (doBroadcast)
        cpost.join(broadcast(bprobe),
          cpost("tok") === bprobe("tok") && bBound && sizeOrder)
          .select(col("a_id"), col("b_id"))
      else {
        val cs = cpost
          .withColumn("__salt",
            pmod(xxhash64(col("b_id")), lit(chunks)).cast("int"))
          .repartition(nParts, col("tok"), col("__salt"))
        val bs = bprobe
          .withColumn("__salt",
            explode(sequence(lit(0), lit(chunks - 1))))
          .repartition(nParts, col("tok"), col("__salt"))
        cs.join(bs, cs("tok") === bs("tok") &&
            cs("__salt") === bs("__salt") && bBound && sizeOrder)
          .select(col("a_id"), col("b_id"))
      }
    // ---- direction 2: corpus doc is the SMALL side ----
    // the corpus probe prefixes are the pos-filtered subset of the
    // SAME postings scan (prefix length is the corpus doc's own
    // floor((1-t)·n)+2); the batch postings are the index side
    val cprobe = index.postings
      .filter(col("pos") + 1 <=
        floor(lit(1.0 - threshold) * col("n")) + lit(2))
      .select(col("doc_id").as("a_id"), col("n").as("a_n"), col("tok"))
    val bpost = bdocs.select(col("doc_id").as("b_id"),
      col("n").as("b_n"), posexplode(col("rtoks")).as(Seq("pos_b", "tok")))
    val cand2 =
      if (doBroadcast)
        cprobe.join(broadcast(bpost),
          cprobe("tok") === bpost("tok") && bBound && sizeOrder)
          .select(col("a_id"), col("b_id"))
      else {
        val cs = cprobe
          .withColumn("__salt",
            pmod(xxhash64(col("a_id")), lit(chunks)).cast("int"))
          .repartition(nParts, col("tok"), col("__salt"))
        val bs = bpost
          .withColumn("__salt",
            explode(sequence(lit(0), lit(chunks - 1))))
          .repartition(nParts, col("tok"), col("__salt"))
        cs.join(bs, cs("tok") === bs("tok") &&
            cs("__salt") === bs("__salt") && bBound && sizeOrder)
          .select(col("a_id"), col("b_id"))
      }
    // the two directions are disjoint by the size order (an unordered
    // batch×corpus pair lands in exactly one), but each surfaces a
    // pair once per shared prefix token — dedup the skinny ids before
    // attaching arrays, as in the batch form
    val candidates = cand1.union(cand2).distinct()
    val lookup = bdocs.select(col("doc_id"), col("n"), col("stoks"))
      .unionByName(index.docs.select(col("doc_id"), col("n"),
        col("stoks")))
    val small = lookup.select(col("doc_id").as("a_id"),
      col("n").as("a_n"), col("stoks").as("a_toks"))
    val big = lookup.select(col("doc_id").as("b_id"),
      col("stoks").as("b_toks"))
    candidates
      .join(small, "a_id")
      .join(big, "b_id")
      .withColumn("inter",
        sortedIntersectAtLeastFracLeftLong(
          col("a_toks"), col("b_toks"), threshold))
      .withColumn("containment",
        col("inter").cast("double") / col("a_n").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("a_id").as("doc_small"), col("b_id").as("doc_big"),
        col("containment"))
  }

  /** Per-partition spanning-forest contraction — the edge-volume
    * reduction that lets the connected-components variants accept a
    * pair miner's raw output at scale. A dense near-dup block of m
    * docs qualifies Θ(m²) pairs (that density is WHY they are
    * near-dups), but connectivity needs only m−1 of them; at sf10
    * q121's blocked cosine pairs are ~5·10⁸ rows, and materializing
    * them through the first CC shuffle is what OOM'd a 24 g driver.
    * Each input partition (for the pair miners: one complete
    * bucket×chunk-pair subgraph per task, so the reduction is maximal)
    * streams through a local union-find and emits an edge ONLY when it
    * merges two components — a spanning forest of that partition's
    * subgraph. Union over partitions preserves every global
    * connection, so the downstream fixpoint labeling is unchanged;
    * output is ≤ (#distinct vertices in the partition − 1) edges with
    * task memory bounded by the same count. Duplicate edges and
    * self-loops die here for free (they never merge anything).
    * Long-id graphs only — non-long vertex ids pass through untouched
    * (the generic path is correct, just not pre-contracted).
    */
  /** Stats-truncating eager local checkpoint — see the Scaladoc on
    * [[connectedComponents]] for why plain `localCheckpoint` is not
    * usable inside an iterative self-join.
    */
  private def flatCheckpoint(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.flatLocalCheckpoint(df)

  private def localSpanningForest(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val fields = edges.schema.fields
    if (fields.length != 2 ||
        fields(0).dataType != LongType || fields(1).dataType != LongType)
      return edges
    val Array(uName, vName) = fields.map(_.name)
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .filter(col(uName).isNotNull && col(vName).isNotNull)
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (c != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.filter { case (u, v) =>
          val ru = find(u); val rv = find(v)
          if (ru == rv) false else { parent(math.max(ru, rv)) = math.min(ru, rv); true }
        }
      }
      .toDF(uName, vName)
  }

  /** The dedup DECISION step: candidate pairs (from [[minhashCandidates]],
    * [[jaccardPairs]], or `Similarity.cosinePairsBlocked`) form an
    * undirected graph; each document's component representative is the
    * MINIMUM doc id reachable from it, and the representative itself is
    * the survivor. Min-label propagation to fixpoint: the converged
    * labeling is canonical (unique regardless of iteration order), which
    * is what makes it oracle-checkable — DuckDB's recursive CTE reaches
    * the same fixpoint by a different route.
    *
    * Scale: each round is one equi-join (edges ⨝ labels on the vertex)
    * + one min-groupBy, then a label-jump self-join
    * (component(v) := component(component(v)) — path compression on the
    * label forest). All shuffles are keyed by vertex id. The jump is
    * what makes this survive deep chains: propagate-only needs
    * graph-diameter rounds (a templated-spam chain at corpus scale can
    * be thousands deep — sf3's regenerated corpus already exceeded 25),
    * propagate+jump needs O(log diameter). Cliquish near-dup graphs
    * (diameter 2-4) still converge in 2-3 rounds, now paying one extra
    * small join each. A stats-truncating local checkpoint per round
    * ([[graft.operators.Dedup.flatCheckpoint]]) keeps BOTH the lineage
    * and the size estimate flat — Spark's own `localCheckpoint` copies
    * the checkpointed plan's estimated Statistics onto the LogicalRDD,
    * so a loop that self-joins its checkpoint would otherwise SQUARE
    * the estimate every round until planning throws `BigInteger would
    * overflow supported range` (~24 rounds). The prior round's blocks
    * are freed as soon as the next materializes. Throws if `maxIters`
    * rounds don't converge — a
    * silently unconverged labeling would be nondeterministic, which is
    * worse than loud.
    */
  def connectedComponents(vertices: DataFrame, id: Column,
                          pairs: DataFrame, src: Column, dst: Column,
                          maxIters: Int = 25,
                          contractEdges: Boolean = false): DataFrame = {
    // NO forest contraction by default, deliberately: min-label's
    // round bound is O(log DIAMETER), and contracting a dense near-dup
    // block (diameter ~1) to a spanning tree (diameter up to block
    // size) trades away exactly the property this variant's bound
    // rests on — measured at sf1: 9 rounds on raw edges vs >25 on the
    // contracted forest. The contraction lives in
    // [[connectedComponentsStar]], whose O(log n) round bound is
    // structure-independent; that is the variant the high-volume pair
    // miners feed (q121). `contractEdges = true` opts back in for
    // edge sets too large to symmetrize raw (Θ(m²) miner output):
    // same fixpoint, bounded memory, but budget maxIters for the
    // deeper contracted forest — safe now that checkpoints truncate
    // stats (no ~24-round planning ceiling).
    // Serialized storage so a big edge set spills instead of OOMing.
    val raw = pairs.select(src.as("src"), dst.as("dst"))
    val e0 = if (contractEdges) localSpanningForest(raw) else raw
    val edges = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var labels = flatCheckpoint(
      vertices.select(id.as("v"), id.as("component")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each vertex keeps the min of its own label and its neighbors'
      // materialized before the self-join below: joining a plan that
      // still contains the union with itself trips Catalyst's
      // constraint rewrite on shared attribute ids; a flat LogicalRDD
      // self-join is unambiguous
      val prop = flatCheckpoint(labels
        .union(edges.join(labels, edges("dst") === labels("v"))
          .select(edges("src").as("v"), col("component")))
        .groupBy(col("v"))
        .agg(min(col("component")).as("component")))
      // label jump: every label value is itself a vertex id, so
      // component∘component is defined; chasing one level per round
      // doubles the effective propagation distance (O(log d) rounds).
      // Monotone (labels only decrease) and stable at the propagation
      // fixpoint (component(m) = m for a component min m), so the
      // converged labeling — and the oracle — are unchanged.
      val next = flatCheckpoint(prop.as("a")
        .join(prop.as("b"), col("a.component") === col("b.v"), "left")
        .select(col("a.v"),
          coalesce(col("b.component"), col("a.component")).as("component")))
      prop.unpersist()
      converged = next.as("n")
        .join(labels.as("p"), col("n.v") === col("p.v"))
        .filter(col("n.component") =!= col("p.component"))
        .isEmpty
      labels.unpersist()
      labels = next
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters or use " +
        "connectedComponentsStar")
    edges.unpersist()
    labels
  }

  /** Star-contraction connected components (alternating large-star /
    * small-star, Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014): converges in O(log n) rounds REGARDLESS of
    * component diameter, where [[connectedComponents]]' min-label
    * propagation needs diameter rounds. A 100 TB near-dup graph will
    * contain pathological chains (templated spam pages each one edit
    * from the next), and this is the variant that survives them.
    *
    * Both steps are expressed so the heavy relation only ever shuffles
    * on a vertex key, and the per-vertex min is a groupBy aggregate
    * (map-side partial combine → tiny shuffle) joined back — NOT a
    * window, which would force every edge of a mega-hub into one task.
    * AQE's skew-join split then handles hub vertices at scale.
    *
    * Invariant kept throughout: the edge set is canonically oriented
    * (u > v), deduplicated, self-loop-free — both steps provably emit
    * only such edges, so each round is exactly
    * groupBy-min → join → distinct. At the fixpoint the edges form
    * stars (v, root-of-component); labels read off with one left join
    * (isolated vertices label themselves).
    *
    * Fixpoint equals [[connectedComponents]]' fixpoint (min reachable
    * id), so the same recursive-CTE oracle gates both.
    */
  def connectedComponentsStar(vertices: DataFrame, id: Column,
                              pairs: DataFrame, src: Column, dst: Column,
                              maxIters: Int = 20): DataFrame = {
    // large-star: every vertex hooks its LARGER neighbors to the min of
    // its neighborhood (m = min(N(u) ∪ {u})); needs both orientations
    // of each edge, so symmetrize per round (cheap union, no shuffle).
    def largeStar(canon: DataFrame): DataFrame = {
      val sym = canon.select(col("u"), col("v"))
        .union(canon.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      sym.join(mins, "u")
        .filter(col("v") > col("u")) // larger neighbors only
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
        .distinct() // output is (v, m) with m <= u < v: canonical
    }
    // small-star: every vertex hooks its SMALLER neighbors (and itself)
    // to the min of the smaller neighborhood; operates on the canonical
    // orientation directly.
    def smallStar(canon: DataFrame): DataFrame = {
      val mins = canon.groupBy(col("u")).agg(min(col("v")).as("mn"))
      canon.join(mins, "u")
        .filter(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v")) // (v, m), v > m
        .union(mins.select(col("u"), col("mn").as("v"))) // (u, m), u > m
        .distinct()
    }
    // forest-contract BEFORE the distinct shuffle (localSpanningForest
    // — a pair miner's quadratic in-block output reduces to ≤ one
    // edge per vertex inside its own tasks; global labels unchanged)
    var edges = localSpanningForest(pairs
        .select(greatest(src, dst).as("u"), least(src, dst).as("v"))
        .filter(col("u") =!= col("v")))
      .distinct()
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var converged = edges.isEmpty // no edges: everything is isolated
    var i = 0
    while (!converged && i < maxIters) {
      val next = flatCheckpoint(smallStar(largeStar(edges)))
      // both sets are distinct + canonical, so equal counts plus empty
      // one-sided difference means set equality
      converged = next.count() == edges.count() &&
        next.except(edges).isEmpty
      edges.unpersist()
      edges = next
      i += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIters rounds " +
        "(bound is O(log n) — raise maxIters)")
    val roots = edges.groupBy(col("u")).agg(min(col("v")).as("root"))
    val labels = vertices.select(id.as("v"))
      .join(roots, col("v") === col("u"), "left")
      .select(col("v"), coalesce(col("root"), col("v")).as("component"))
    edges.unpersist()
    labels
  }
}
