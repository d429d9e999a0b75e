package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.functions.expressions.CustomExpressions.boundedTopK

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; the corpus side streams,
  * queries broadcast — at 100 TB this is the "small query batch × huge
  * corpus" shape, one pass, no shuffle of the corpus). Scale path:
  * sign-bit LSH bucketing so each query only scores its bucket —
  * trading recall for a corpus-partition-local join; an IVF variant
  * would swap the bucket fn for learned centroids, same plan shape.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine similarity.
    * `queries`/`corpus` need (`id`, `vec`) columns named by the params.
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     id: String, vec: String, k: Int,
                     roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms are precomputed per side (not per pair) — same arithmetic,
    // O(n) instead of O(n*q) sqrt work
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      l2Norm(col(vec)).as("qn"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      l2Norm(col(vec)).as("cn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      // round before ranking: an ULP of cross-engine divergence in the
      // dot product must not flip a rank
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Approximate top-k: both sides are hashed to a sign-bit bucket and
    * only same-bucket pairs are scored. Recall is tunable via `nbits`
    * (fewer bits → bigger buckets → higher recall & cost). Multi-probe
    * (also scoring neighboring buckets) would be the next refinement.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              id: String, vec: String, k: Int, nbits: Int,
              roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("qn"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("cn"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
              col("cos"), col("rank"))
  }

  /** Multi-probe LSH top-k: like [[lshTopK]], but each query also
    * probes every bucket within Hamming distance `maxHamming` of its
    * own (default 1 = one sign-bit flip), recovering most neighbors
    * that a flipped bit would otherwise hide — the standard recall
    * repair for sign-bit LSH without growing the buckets themselves.
    * Probe count is sum of C(nbits, i) for i <= maxHamming; measured
    * on the fixture (nbits=4, k=5): recall@5 0.14 single-probe ->
    * 0.54 at H1 (5 probes) -> higher again at H2 (11 probes) — the
    * recall/cost knob per query, chosen per workload.
    *
    * Scale: the query side expands ×probes BEFORE the join — cheap,
    * queries are the broadcast-small side — while the corpus is still
    * hashed once and never shuffled beyond the bucket equi-join. A
    * (query, neighbor) pair can match through at most one probe
    * (corpus rows live in exactly one bucket), so no dedup pass is
    * needed.
    */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame,
                        id: String, vec: String, k: Int, nbits: Int,
                        roundTo: Int = 9, maxHamming: Int = 1): DataFrame = {
    // masks() terminates its popcount bound only at h == 0, so a
    // negative radius would silently enumerate ALL 2^nbits masks
    // (full cross-bucket probe) instead of failing
    require(maxHamming >= 0 && maxHamming <= nbits,
      s"maxHamming must be in [0, $nbits], got $maxHamming")
    import org.apache.spark.sql.expressions.Window
    // all XOR masks with popcount <= maxHamming, built combinatorially
    // (never enumerates 2^nbits)
    def masks(bits: List[Int], h: Int): Seq[Int] =
      if (h == 0) Seq(0)
      else bits match {
        case Nil       => Seq(0)
        case b :: rest =>
          masks(rest, h) ++ masks(rest, h - 1).map(_ | (1 << b))
      }
    val flips =
      array(masks((0 until nbits).toList, maxHamming).distinct.sorted
        .map(lit): _*)
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
        signBucket(col(vec), nbits).as("qbucket"), l2Norm(col(vec)).as("qn"))
      .withColumn("flip", explode(flips))
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("flip")))
      .drop("qbucket", "flip")
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("cn"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"),
              col("cos"), col("rank"))
  }

  /** Mini k-means for IVF coarse quantization: deterministic init (the
    * k lowest-id vectors), fixed iteration count, and cross-engine
    * reproducible updates — assignment cosines are rounded to 9
    * decimals before the argmax and per-dimension means go through an
    * exact decimal sum and are rounded to 9 decimals, so the DuckDB
    * oracle replays the identical training trajectory (the q54 gate:
    * `SimilarityQueries.duckIvf` unrolls these steps as CTEs).
    * Returns (centroid_id, centroid: array<double>).
    *
    * Scale: each iteration is one broadcast (centroids) + one map
    * (assign) + one shuffle (groupBy centroid for the means) — the
    * textbook distributed Lloyd step. Each iteration ends in an eager
    * `localCheckpoint` so lineage (and thus plan size) stays flat no
    * matter how many Lloyd steps run; the prior iteration's blocks are
    * unpersisted as soon as the next materializes, so peak storage is
    * one k-row table. Caveat: localCheckpoint is not recoverable on
    * executor loss — on a real cluster configure a checkpoint dir and
    * swap in reliable `checkpoint()` for long training runs.
    */
  def trainCentroids(corpus: DataFrame, id: String, vec: String,
                     k: Int, iters: Int, roundTo: Int = 9): DataFrame = {
    // r21 note: checkpointing this projection (the MLlib cache-your-
    // k-means-input pattern) was tried BOTH eagerly and lazily and
    // REVERTED: the LogicalRDD barrier erases Catalyst's size
    // estimates, so downstream joins that should broadcast plan as
    // sort-merge, costing more than the saved re-projection (measured
    // q124 solo 2.11 -> 2.26 s eager, 2.92 s lazy at sf0.1). The
    // per-iteration recompute is one column projection per Lloyd
    // step; the per-step centroid localCheckpoint below (which keeps
    // the PLAN flat, its actual job) stays.
    val v = corpus.select(col(id).as("cid"), toDoubles(col(vec)).as("v"))
    var centroids = v.orderBy(col("cid")).limit(k)
      .select(col("cid").as("centroid_id"), col("v").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignToCentroid(v, centroids, "v", roundTo)
      val prev = centroids
      // r22 one-exchange Lloyd step: per-dim decimal-exact (sum, count)
      // via the VectorMeanParts partial aggregate — one groupBy on
      // centroid_id (ONE exchange of k sketch-sized rows) instead of
      // posexplode → (centroid, dim) agg → (centroid) agg (TWO
      // exchanges behind an n×dims row explosion). The division and
      // 9-decimal round stay in Catalyst on the same (double, bigint)
      // types, so the means are bit-identical to the exploded form
      // (decimal sums are order-independent; equality property-tested
      // in SimilaritySpec and oracled by q54/q122/q124/q125/q127).
      centroids = assigned
        .groupBy(col("centroid_id"))
        .agg(graft.functions.expressions.CustomExpressions
          .vectorMeanParts(col("v")).as("mp"))
        .select(col("centroid_id"),
          transform(col("mp"),
            p => round(p.getField("s") / p.getField("c"), roundTo))
            .as("centroid"))
        // truncate lineage: without this each Lloyd step re-plans the
        // whole preceding chain and the plan grows superlinearly
        .localCheckpoint()
      // eager checkpoint above has materialized the new centroids, so
      // the previous iteration's blocks can go (no-op on iteration 0,
      // whose `prev` was never persisted)
      prev.unpersist()
    }
    centroids
  }

  /** Nearest centroid per row by cosine (broadcast centroids); the
    * cosine is rounded before the argmax so an ULP of cross-engine
    * divergence can't flip an assignment.
    *
    * MAP-ONLY: the centroid table is collapsed to ONE array row
    * (sorted by centroid_id) and broadcast, and the argmax runs inside
    * a projection over that array — no crossJoin row expansion and,
    * critically, no row_number window, whose required shuffle would
    * move n×C rows EACH CARRYING THE FULL VECTOR (at C ∝ n that is a
    * quadratic, vector-payload exchange — the scale wall this shape
    * avoids). Ties break to the lowest centroid_id (`array_position`
    * returns the FIRST max, and the array is id-sorted), identical to
    * the former window's (cos DESC, centroid_id ASC) order; cosines
    * round to `roundTo` first, so assignments — and every oracle that
    * replays them (q54/q122/q124) — are bit-stable across engines and
    * across this plan change (pinned in SimilaritySpec).
    */
  private def assignToCentroid(rows: DataFrame, centroids: DataFrame,
                               vecCol: String, roundTo: Int = 9): DataFrame = {
    val cArr = centroids.agg(
      array_sort(collect_list(struct(col("centroid_id"), col("centroid"),
        l2Norm(col("centroid")).as("cnrm")))).as("cs"))
    rows.crossJoin(broadcast(cArr))
      .withColumn("nv", l2Norm(col(vecCol)))
      // a zero-norm row (or a degenerate all-zero centroid) makes the
      // divisor 0: under ANSI (Spark 4 default) a plain Divide KILLS
      // the whole assignment job, and under legacy mode it yields NULL,
      // poisoning array_max/array_position below so the row SILENTLY
      // DROPS from the index (null centroid_id). try_divide + coalesce
      // to -1.0 — below any real cosine — lands such rows
      // deterministically on the lowest-id centroid instead.
      .withColumn("ds", transform(col("cs"), c =>
        coalesce(round(try_divide(dot(col(vecCol), c.getField("centroid")),
          col("nv") * c.getField("cnrm")), roundTo), lit(-1.0))))
      .withColumn("centroid_id",
        element_at(col("cs"),
          array_position(col("ds"), array_max(col("ds"))).cast("int"))
          .getField("centroid_id"))
      .drop("cs", "nv", "ds")
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into centroid lists once; each query probes its `nprobe` nearest
    * centroids and scores only those lists. Same plan shape as lshTopK
    * with learned buckets instead of sign bits — recall/cost tunable
    * via (k centroids, nprobe).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, id: String,
              vec: String, k: Int, centroids: DataFrame, nprobe: Int,
              roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = assignToCentroid(
      corpus.select(col(id).as("cid"), toDoubles(col(vec)).as("v")),
      centroids, "v", roundTo)
      .select(col("cid").as("neighbor_id"), col("v").as("cv"),
              col("centroid_id"))
    // each query picks its nprobe closest centroids
    val qAssign = queries.select(col(id).as("qid"), toDoubles(col(vec)).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", round(cosine(col("qv"), col("centroid")), roundTo))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("d").desc, col("centroid_id"))
    val q = qAssign.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("qid").as("query_id"), col("qv"), col("centroid_id"))
    val scored = broadcast(q).join(c, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) /
        (l2Norm(col("qv")) * l2Norm(col("cv"))), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("centroid_id"),
              col("cos"), col("rank"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Exact O(n²) within — use only on bounded corpora; kept exact here
    * as the correctness baseline. The production path at corpus scale
    * is [[cosinePairsBlocked]], which trades recall across buckets for
    * a bucket-local equi-join.
    */
  def cosinePairs(df: DataFrame, id: String, vec: String,
                  threshold: Double, roundTo: Int = 9): DataFrame = {
    // the stream side of the nested-loop join gets an explicit round-
    // robin repartition: an embeddings table is small in BYTES (20k
    // rows ≈ 6 MB at sf1 — one scan split at any maxPartitionBytes)
    // while the pair scan is O(n²), so without it the whole cross
    // product runs on one thread (measured 13 min at sf1, ~40 s
    // repartitioned)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.select(col(id).as("id_a"), col(vec).as("va"),
      l2Norm(col(vec)).as("na")).repartition(parts)
    val b = df.select(col(id).as("id_b"), col(vec).as("vb"),
      l2Norm(col(vec)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      // round before thresholding so borderline values can't split
      // between engines
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), roundTo))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** LSH-blocked near-dup pairs — the scale path for [[cosinePairs]]:
    * both sides hash to a sign-bit bucket and the exact cosine is only
    * computed within a bucket, turning the O(n²) self-cross-join into
    * a bucket equi-join (shuffle on bucket, O(b²) per bucket). Same
    * output schema as [[cosinePairs]]; pairs split across buckets are
    * the (tunable via `nbits`) recall loss. At 100 TB this is the
    * near-dup shape that works: no row ever meets a row outside its
    * bucket, so cost scales with Σ bucket² not corpus².
    *
    * `chunks` is the [[TrianglePairs]] skew knob: 2^nbits buckets is a
    * low-cardinality join key (16 here), and clustered embeddings
    * concentrate in few sign buckets, so the hot bucket's quadratic
    * scan would otherwise run on one thread.
    */
  def cosinePairsBlocked(df: DataFrame, id: String, vec: String,
                         threshold: Double, nbits: Int,
                         roundTo: Int = 9, chunks: Int = 16): DataFrame = {
    val rows = df.select(col(id).as("vid"), col(vec).as("v"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("nrm"))
    val (a, b, keyCond) =
      TrianglePairs.salted(rows, "vid", Seq("bucket"), chunks)
    a.join(b, keyCond &&
        TrianglePairs.orderedOnce(col("a.vid"), col("b.vid")))
      .withColumn("cos",
        round(dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), roundTo))
      .filter(col("cos") >= threshold)
      .select(least(col("a.vid"), col("b.vid")).as("id_a"),
              greatest(col("a.vid"), col("b.vid")).as("id_b"),
              col("cos"))
  }

  /** CAPPED-output near-neighbor mining: each doc's top-`k` neighbors
    * (by exact cosine, floor `threshold`) among its sign-bucket
    * co-residents — the variant of [[cosinePairsBlocked]] a corpus-
    * scale user actually runs. The full qualifying-pair set is
    * Θ(Σ bucket²·density) and grows superlinearly on a clustered
    * corpus (q57 at sf10: 498 M pairs — pure output volume); this
    * caps the OUTPUT at Θ(n·k) and, critically, caps the SHUFFLE too:
    * the per-doc ranking is the [[graft.functions.expressions.BoundedTopK]]
    * aggregate, whose map-side partial buffers bound the exchange at
    * k entries per doc per partition — a `row_number` window would
    * shuffle every qualifying directed pair instead.
    *
    * Each unordered in-bucket pair is scored ONCE (triangle-salted
    * i<j join, the [[TrianglePairs]] skew treatment), then both
    * directions enter the ranking. Docs with no qualifying neighbor
    * emit nothing. Deterministic: cosines round to `roundTo` before
    * ranking and ties break by neighbor id, so the kept set is a
    * total-order prefix any engine reproduces.
    */
  def cosineTopKBlocked(df: DataFrame, id: String, vec: String,
                        k: Int, threshold: Double, nbits: Int,
                        roundTo: Int = 9, chunks: Int = 16): DataFrame = {
    val rows = df.select(col(id).as("vid"), col(vec).as("v"),
      signBucket(col(vec), nbits).as("bucket"), l2Norm(col(vec)).as("nrm"))
    val (a, b, keyCond) =
      TrianglePairs.salted(rows, "vid", Seq("bucket"), chunks)
    val scored = a.join(b, keyCond &&
        TrianglePairs.orderedOnce(col("a.vid"), col("b.vid")))
      .withColumn("cos",
        round(dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), roundTo))
      .filter(col("cos") >= threshold)
      .select(col("a.vid").as("xa"), col("b.vid").as("xb"), col("cos"))
    // both directions in ONE pass: a union of two selects over `scored`
    // would re-run the whole pair join per branch (two scans, two
    // joins — verified in the physical plan); a 2-element explode emits
    // (a→b, b→a) from the single scored row inside the same stage
    val directed = scored
      .select(explode(array(
        struct(col("xa").as("doc_id"), col("xb").as("neighbor_id"),
          col("cos")),
        struct(col("xb").as("doc_id"), col("xa").as("neighbor_id"),
          col("cos")))).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        col("d.neighbor_id").as("neighbor_id"), col("d.cos").as("cos"))
    directed.groupBy(col("doc_id"))
      .agg(boundedTopK(col("cos"), col("neighbor_id"), k).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("doc_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("cos"), (col("p") + 1).cast("int").as("rank"))
  }

  /** Like [[assignToCentroid]], but emits the runner-up too — and the
    * winning (rounded) cosine, so a capacity rebalance can rank a
    * list's members by closeness. Identical winner/tie semantics
    * (first max of the id-sorted array = lowest centroid_id); the
    * runner-up masks the winner's slot and re-argmaxes, so on a tied
    * max the runner-up is the second-lowest id — exactly DuckDB's
    * `row_number() ORDER BY d DESC, id` rn=2.
    */
  private def assignToCentroid2(rows: DataFrame, centroids: DataFrame,
                                vecCol: String, roundTo: Int = 9)
      : DataFrame = {
    val cArr = centroids.agg(
      array_sort(collect_list(struct(col("centroid_id"), col("centroid"),
        l2Norm(col("centroid")).as("cnrm")))).as("cs"))
    rows.crossJoin(broadcast(cArr))
      .withColumn("nv", l2Norm(col(vecCol)))
      .withColumn("ds", transform(col("cs"), c =>
        coalesce(round(try_divide(dot(col(vecCol), c.getField("centroid")),
          col("nv") * c.getField("cnrm")), roundTo), lit(-1.0))))
      .withColumn("bd", array_max(col("ds")))
      .withColumn("bp", array_position(col("ds"), col("bd")))
      .withColumn("centroid_id",
        element_at(col("cs"), col("bp").cast("int")).getField("centroid_id"))
      // mask the winner's slot (-2 is below any cosine and the -1
      // zero-norm fallback), then the same first-max argmax
      .withColumn("ds2", transform(col("ds"), (d, i) =>
        when(i === col("bp") - 1, lit(-2.0)).otherwise(d)))
      .withColumn("second_id",
        element_at(col("cs"),
          array_position(col("ds2"), array_max(col("ds2"))).cast("int"))
          .getField("centroid_id"))
      .drop("cs", "nv", "ds", "bp", "ds2")
  }

  /** Materialized IVF index: the corpus assigned to its nearest
    * centroid and written partitioned by `list_id` — the embedding
    * analog of `Dedup.writeBucketIndex`'s materialized dedup index.
    * The k-means and the full-corpus assignment scan are paid ONCE,
    * offline; every later query batch probes the layout read-only.
    *
    * `listCap > 0` enables ONE deterministic overflow round: each
    * list ranks its members by (assignment cosine DESC, id) and
    * members past the cap move to their second-nearest centroid. Why:
    * k-means lists are balanced in expectation only, and the indexed
    * miners' candidate volume Σ|la|×|lb| inherits a superlinear term
    * from hot lists (measured exponent 1.16 sf1→sf10 uncapped —
    * PLANS.md r17/r19); the cap restores Θ(n·nprobe·cap) by
    * construction. The round is single-pass (no cascade: a receiving
    * list may exceed the cap by what it receives — a bounded slack,
    * stated honestly rather than iterated away), costs one
    * list-keyed window exchange in the BUILD (the amortized offline
    * pass; probe reads stay untouched), and is deterministic —
    * farthest members overflow first, ties by id — so the DuckDB
    * oracle replays it (q124/q125). The recall effect is gated by
    * RecallSpec's ≥ 0.95 law: an overflowed boundary item lands in
    * its second-nearest list, whose probe set almost always contains
    * the original neighbor region.
    *
    * Scale: `partitionBy(list_id)` makes the list the unit of I/O.
    * A probe joining the (tiny, broadcast) query×nprobe-list frame
    * against this scan triggers dynamic partition pruning, so a
    * batch touching p of C lists READS p/C of the corpus bytes —
    * the index never rebuilds, never reshuffles, and the pruning is
    * visible in the plan (`PartitionFilters: dynamicpruning...`,
    * pinned in PlansSpec). The per-item norm is precomputed at build
    * time so probe-side scoring does no per-pair sqrt over the
    * corpus vector.
    */
  def writeIvfIndex(corpus: DataFrame, id: String, vec: String,
                    centroids: DataFrame, path: String,
                    roundTo: Int = 9, listCap: Int = 0): Unit = {
    import org.apache.spark.sql.expressions.Window
    val v = corpus.select(col(id).as("cid"), toDoubles(col(vec)).as("v"))
    val assigned =
      if (listCap <= 0) assignToCentroid(v, centroids, "v", roundTo)
      else {
        val w = Window.partitionBy(col("centroid_id"))
          .orderBy(col("bd").desc, col("cid"))
        assignToCentroid2(v, centroids, "v", roundTo)
          .withColumn("lr", row_number().over(w))
          .withColumn("centroid_id",
            when(col("lr") <= listCap, col("centroid_id"))
              .otherwise(col("second_id")))
          .drop("bd", "second_id", "lr")
      }
    assigned
      .select(col("cid").as("item_id"), col("v").as("cv"),
        l2Norm(col("v")).as("cn"), col("centroid_id").as("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
  }

  /** Read a [[writeIvfIndex]] layout back as the corpus side of
    * [[ivfProbeIndexed]].
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    graft.Tables.readCached(spark, path)

  /** Probe-only ANN over a materialized [[writeIvfIndex]] layout:
    * each query picks its `nprobe` closest centroids (broadcast) and
    * only those lists of the index are scanned (dynamic partition
    * pruning) and scored. Same ranking semantics as [[ivfTopK]] —
    * pinned equal in SimilaritySpec — without the per-batch k-means
    * or corpus assignment.
    */
  def ivfProbeIndexed(index: DataFrame, queries: DataFrame, id: String,
                      vec: String, k: Int, centroids: DataFrame,
                      nprobe: Int, roundTo: Int = 9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qAssign = queries
      .select(col(id).as("qid"), toDoubles(col(vec)).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", round(cosine(col("qv"), col("centroid")), roundTo))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("d").desc, col("centroid_id"))
    val q = qAssign.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("qid").as("query_id"), col("qv"),
        l2Norm(col("qv")).as("qn"), col("centroid_id").as("list_id"))
    val scored = index.join(broadcast(q), Seq("list_id"))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) /
        (col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id").as("neighbor_id"),
        col("list_id").cast("long").as("centroid_id"),
        col("cos"), col("rank"))
  }

  /** Threshold-qualifying pairs of an IVF-indexed corpus — the shared
    * candidate stage of [[cosineTopKIndexed]] (top-k capped mining)
    * and [[nearDupComponentsIndexed]] (the dedup decision path).
    * Candidates are the symmetric closure of "the `nprobe` lists
    * nearest each list" over a broadcast C×C centroid adjacency (self
    * pair always included); each unordered candidate pair is scored
    * exactly once (same-list pairs oriented aid < bid, cross-list
    * pairs in adjacency orientation) and kept at `cos >= threshold`.
    * Returns (aid, bid, cos).
    */
  /** The probed-list adjacency of the indexed miners, as UNORDERED
    * pairs (la <= lb, self pairs included) — shared by
    * [[indexedQualifyingPairs]] and the A/B volume accounting
    * ([[graft.AbTopKIndexed]]), so the measured candidate volume is
    * the operator's by construction, not a reimplementation.
    *
    * `inDegreeCap` (0 = off, the production default) is the hub
    * mitigation EXPERIMENT the r19 adjudication left open (PLANS.md
    * r19 finding 2: nearest-partner selection concentrates on full
    * hub lists, keeping the one-decade candidate exponent at 1.12
    * after the occupancy cap). When > 0: each list ranks its
    * `nprobe-1` nearest non-self partners plus ONE fallback
    * alternate; a partner admits at most `inDegreeCap` probers (by
    * descending centroid cosine, ties by prober id); probers rejected
    * everywhere keep their nearest partner anyway (never fewer
    * probes, so the recall floor of the uncapped form is preserved
    * for starved lists). Deterministic, pure plan, same C×C
    * broadcast economics.
    */
  private[graft] def probeAdjacency(centroids: DataFrame, nprobe: Int,
                                    roundTo: Int = 9,
                                    inDegreeCap: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, "nprobe must be >= 1")
    val cA = centroids.select(col("centroid_id").as("list_id"),
      col("centroid").as("av"))
    val cB = centroids.select(col("centroid_id").as("probe_list"),
      col("centroid").as("bv"))
    val wadj = Window.partitionBy(col("list_id"))
      .orderBy(col("d").desc, col("probe_list"))
    val directed =
      if (inDegreeCap <= 0)
        cA.crossJoin(cB)
          .withColumn("d", round(cosine(col("av"), col("bv")), roundTo))
          .withColumn("rn", row_number().over(wadj))
          .filter(col("rn") <= nprobe)
          .select(col("list_id"), col("probe_list"))
      else {
        val ranked = cA.crossJoin(cB)
          .filter(col("list_id") =!= col("probe_list"))
          .withColumn("d", round(cosine(col("av"), col("bv")), roundTo))
          .withColumn("rn", row_number().over(wadj))
        val p = math.max(1, nprobe - 1) // non-self probes per list
        val cand = ranked.filter(col("rn") <= p + 1)
        val wIn = Window.partitionBy(col("probe_list"))
          .orderBy(col("d").desc, col("list_id"))
        val admitted = cand
          .withColumn("dr", row_number().over(wIn))
          .filter(col("dr") <= inDegreeCap)
        val wOut = Window.partitionBy(col("list_id"))
          .orderBy(col("rn").asc)
        val kept = admitted.withColumn("kr", row_number().over(wOut))
          .filter(col("kr") <= p)
          .select(col("list_id"), col("probe_list"))
        val starved = ranked.filter(col("rn") === 1)
          .join(kept.select(col("list_id")).distinct(),
            Seq("list_id"), "left_anti")
          .select(col("list_id"), col("probe_list"))
        kept.union(starved)
      }
    // a list must ALWAYS probe itself: if training produced two
    // (rounded-)identical centroids, the d-then-id tiebreak can rank
    // the twin ABOVE the self pair and, at nprobe=1, drop it — the
    // affected list's members would then never be scored against
    // each other (green gates, silent recall hole). The union is
    // id-deduped by the distinct below.
    // symmetric closure as UNORDERED list pairs: a pair of lists is
    // scored once if EITHER list probes the other. Halves the dot
    // products vs directed probing (each candidate pair scored once,
    // both directions emitted by a 2-element explode — the
    // cosineTopKBlocked trick) and is a recall superset of directed
    // probing (a finds b even when only b's list probes a's).
    directed
      .union(centroids.select(col("centroid_id").as("list_id"),
        col("centroid_id").as("probe_list")))
      .select(least(col("list_id"), col("probe_list")).as("la"),
        greatest(col("list_id"), col("probe_list")).as("lb"))
      .distinct()
  }

  private[graft] def indexedQualifyingPairs(
      index: DataFrame, centroids: DataFrame, threshold: Double,
      nprobe: Int, roundTo: Int = 9, inDegreeCap: Int = 0): DataFrame = {
    val lp = probeAdjacency(centroids, nprobe, roundTo, inDegreeCap)
    val a = index.select(col("item_id").as("aid"), col("cv").as("av"),
      col("cn").as("an"), col("list_id").as("la"))
    val b = index.select(col("item_id").as("bid"), col("cv").as("bv"),
      col("cn").as("bn"), col("list_id").as("lb"))
    // the only exchange in the mining pass: both sides hash on the
    // probed-list key (a expanded ×|sym adjacency| by the broadcast
    // pair table first)
    a.join(broadcast(lp), Seq("la"))
      .join(b, Seq("lb"))
      // same-list pairs appear in both (a,b) and (b,a) order — keep
      // i<j once; cross-list pairs appear exactly once already
      .filter(col("la") =!= col("lb") || col("aid") < col("bid"))
      .withColumn("cos",
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")),
          roundTo))
      .filter(col("cos") >= threshold)
      .select(col("aid"), col("bid"), col("cos"))
  }

  /** INDEXED capped pair mining — [[cosineTopKBlocked]]'s scale form,
    * blocking on a materialized IVF layout ([[writeIvfIndex]]) instead
    * of sign buckets. Candidates come from [[indexedQualifyingPairs]]
    * (symmetric-closure probed-list pairs, each scored once), then
    * both directions rank through the same BoundedTopK partial-heap
    * as the blocked variant (top-`k` per doc, floor `threshold`).
    *
    * Why this beats sign buckets at scale: candidate volume here is
    * n × nprobe × listSize BY CONSTRUCTION — density-independent —
    * because every doc scores exactly its probed lists, however
    * clustered the corpus. Sign buckets concentrate a clustered
    * corpus into few hot buckets (axis-aligned projections can't
    * follow the data), so Σ bucket² grows superlinearly even with the
    * [[BlockDials.signBits]] resolution dial (measured exponent 1.27
    * at sf1→sf10, candidate exponent 1.70 — PLANS.md round 16/17).
    * With [[BlockDials.ivfLists]] scaling C ∝ n, listSize stays
    * ~constant and the mining pass is Θ(n). The recall trade: a true
    * neighbor outside the doc's `nprobe` adjacent lists is missed —
    * measured against ground truth in AbTopKIndexed (PLANS.md).
    *
    * Skew: list sizes are k-means-balanced, not guaranteed-bounded; a
    * genuinely hot list splits under AQE skew-join handling (the probe
    * join is a plain shuffle join on list id, not a self-join needing
    * salting).
    *
    * Determinism: the adjacency ranks by rounded centroid-pair cosine
    * (ties by probe list id), pair scores round to `roundTo` before
    * ranking, ranking ties break by neighbor id — a total order any
    * engine replays (q124's oracle).
    */
  def cosineTopKIndexed(index: DataFrame, centroids: DataFrame,
                        k: Int, threshold: Double, nprobe: Int,
                        roundTo: Int = 9, inDegreeCap: Int = 0): DataFrame = {
    val scored =
      indexedQualifyingPairs(index, centroids, threshold, nprobe, roundTo,
        inDegreeCap)
    val directed = scored
      .select(explode(array(
        struct(col("aid").as("doc_id"), col("bid").as("neighbor_id"),
          col("cos")),
        struct(col("bid").as("doc_id"), col("aid").as("neighbor_id"),
          col("cos")))).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        col("d.neighbor_id").as("neighbor_id"), col("d.cos").as("cos"))
    directed.groupBy(col("doc_id"))
      .agg(boundedTopK(col("cos"), col("neighbor_id"), k).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("doc_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("cos"), (col("p") + 1).cast("int").as("rank"))
  }

  /** Blocked near-dup pairs fed STRAIGHT into connected components:
    * the dedup-decision composition whose output is Θ(n) labels — the
    * other capped form of [[cosinePairsBlocked]] (a 100 TB curation
    * run wants "which docs are duplicates of what", not the 498 M-row
    * pair list). The scored pair table is never materialized: only
    * the skinny (id_a, id_b) long pairs flow into star-contraction CC
    * ([[Dedup.connectedComponentsStar]] — O(log n) rounds regardless
    * of component diameter), which canonicalizes + dedups them as its
    * own first step. Returns (v, component) per input doc; component
    * = min reachable id, the same canonical fixpoint q47/q103 gate.
    *
    * Blocking caveat: sign buckets lose 22–30% of planted near-dup
    * pairs on clustered corpora (PLANS.md round 17) — prefer
    * [[nearDupComponentsIndexed]] (IVF-list blocking, recall ≥ 0.95)
    * when the corpus is a real text-embedding distribution.
    */
  def nearDupComponents(df: DataFrame, id: String, vec: String,
                        threshold: Double, nbits: Int,
                        roundTo: Int = 9, chunks: Int = 16): DataFrame = {
    val pairs = cosinePairsBlocked(df, id, vec, threshold, nbits,
      roundTo, chunks).select(col("id_a"), col("id_b"))
    Dedup.connectedComponentsStar(df.select(col(id)), col(id),
      pairs, col("id_a"), col("id_b"))
  }

  /** [[nearDupComponents]] over IVF-list blocking — the PRODUCTION
    * dedup decision path for clustered (i.e. real text-embedding)
    * corpora. Sign buckets slice tight angular cones apart
    * (0.70–0.78 planted-pair recall on the clustered fixture —
    * PLANS.md round 17), silently under-merging; learned IVF lists
    * follow the data, and [[indexedQualifyingPairs]]' self-unioned
    * symmetric-closure probing holds planted-pair recall ≥ 0.95 at
    * nprobe ≥ 2 (RecallSpec pins the law on a committed fixture
    * generator). Candidate volume stays n·nprobe·listSize by
    * construction ([[BlockDials.ivfLists]]), so the decision pass is
    * Θ(n) however clustered the corpus.
    *
    * The qualifying-pair table is never materialized: the skinny
    * (aid, bid) pairs flow straight into star-contraction CC
    * ([[Dedup.connectedComponentsStar]], O(log n) rounds regardless
    * of component diameter). Returns (v, component) per indexed item;
    * component = min reachable id, the same canonical fixpoint the
    * q47/q103/q121 oracles gate.
    */
  def nearDupComponentsIndexed(index: DataFrame, centroids: DataFrame,
                               threshold: Double, nprobe: Int,
                               roundTo: Int = 9,
                               inDegreeCap: Int = 0): DataFrame = {
    val pairs =
      indexedQualifyingPairs(index, centroids, threshold, nprobe, roundTo,
        inDegreeCap)
        .select(col("aid"), col("bid"))
    Dedup.connectedComponentsStar(index.select(col("item_id")),
      col("item_id"), pairs, col("aid"), col("bid"))
  }
}
