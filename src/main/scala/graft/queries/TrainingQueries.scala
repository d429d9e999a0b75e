package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokenCount
import graft.operators.{Mixture, Packing}
import graft.sinks.ShardedSink

/** Training-data assembly surface: the steps between a cleaned corpus
  * and what a trainer actually reads — sequence packing into fixed
  * context windows, and deterministic engine-neutral sharding for the
  * global shuffle. Both are oracled like every other query; the
  * packing prefix sum is the distributed two-level form
  * (operators/Packing.scala), never a corpus-wide single partition.
  */
object TrainingQueries extends Catalog {

  private val ws = graft.functions.TextFunctions.wsClass
  private val duckToks = s"regexp_split_to_array(trim(text), '$ws+')"

  /** Context-window token budget for q105. */
  private val PackBudget = 512

  /** q105 bucket width — small so the multi-bucket decomposition is
    * exercised even at the sf0.01 gate (4 buckets there, ~400 at sf1);
    * the operator default (1M) is the 100 TB setting. */
  private val PackBucket = 128L

  /** q114 global token budget: ~a third of the sf0.01 corpus, so the
    * cut lands mid-bucket at every scale factor. */
  private val SelectBudget = 8000L

  /** q107 target mixture — three sources, downsample-only. */
  private val MixShares: Seq[(String, Double)] =
    Seq("src3" -> 0.45, "src7" -> 0.35, "src11" -> 0.2)
  private def MixSharesSql: String = MixShares
    .map { case (g, s) => s"WHEN '$g' THEN CAST($s AS DOUBLE)" }
    .mkString(" ")
  private def MixSourcesSql: String =
    MixShares.map(p => s"'${p._1}'").mkString(", ")

  override val queries: Seq[Q] = Seq(

    // Sequence packing (concat-and-chunk): documents in doc_id order
    // are laid into one token stream, cut every `PackBudget` tokens; a
    // doc belongs to the window its START offset falls in. Spark side
    // is the distributed prefix sum; the oracle is the literal
    // single-window cumsum — integer arithmetic, so they agree bit-for
    // -bit and the oracle doubles as the decomposition proof.
    Q("q105_seq_pack",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Packing.packByTokenBudget(docs, col("doc_id"),
            tokenCount(col("text")), PackBudget, PackBucket)
          .groupBy(col("window_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tokens_begun"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("window_id"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    CAST(len($duckToks) AS BIGINT) AS n_tok
              |  FROM documents),
              |c AS (
              |  SELECT doc_id, n_tok,
              |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) AS st
              |  FROM t)
              |SELECT CAST(FLOOR(st / $PackBudget) AS BIGINT) AS window_id,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(n_tok) AS BIGINT) AS tokens_begun,
              |  MIN(doc_id) AS first_doc,
              |  MAX(doc_id) AS last_doc
              |FROM c GROUP BY window_id
              |ORDER BY window_id""".stripMargin)),

    // Deterministic global shuffle + sharding: shard = first md5 hex
    // byte of the doc id (256 shards), shuffle order = the full
    // digest. md5 is bit-identical across engines (unlike either
    // engine's native hash()), so the assignment is reproducible
    // anywhere — the property a training run needs to resume or
    // re-materialize a shard. Map-only until the per-shard agg; the
    // balance stats (count, payload bytes) are what an operator
    // watches for hot shards.
    Q("q106_det_shard",
      (s, dir) => {
        val key = md5(col("doc_id").cast("string"))
        Tables.load(s, dir, "documents")
          .select(substring(key, 1, 2).as("shard"), key.as("k"),
            col("n_chars"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("k")).as("first_key"),
            max(col("k")).as("last_key"))
          .orderBy(col("shard"))
      },
      Some("""SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  MIN(md5(CAST(doc_id AS VARCHAR))) AS first_key,
             |  MAX(md5(CAST(doc_id AS VARCHAR))) AS last_key
             |FROM documents GROUP BY shard
             |ORDER BY shard""".stripMargin)),

    // Source-mixture resampling (operators/Mixture.scala): thin the
    // corpus so surviving tokens split 45/35/20 across three sources,
    // downsampling only — the binding source (the one whose target
    // share is largest relative to its actual tokens) keeps rate 1.
    // The oracle rebuilds the identical double-arithmetic rate
    // expression (CAST AS DOUBLE matters: DuckDB's bare 0.45 is a
    // DECIMAL and would divide on a different grid), so the integer
    // md5 thresholds — and therefore the exact surviving doc set —
    // match bit-for-bit.
    Q("q107_mixture_resample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("n_tok", tokenCount(col("text")).cast("long"))
        Mixture.resampleToShares(docs, col("doc_id"), col("source"),
            col("n_tok"), MixShares)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tokens_kept"),
            round(max(col("mix_rate")), 6).as("rate"),
            min(col("doc_id")).as("first_doc"))
          .withColumn("achieved_share",
            round(col("tokens_kept")
              / sum(col("tokens_kept")).over(), 6))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, source,
              |    CAST(len($duckToks) AS BIGINT) AS n_tok
              |  FROM documents),
              |t AS (
              |  SELECT source AS g, CAST(SUM(n_tok) AS BIGINT) AS tok,
              |    CASE source $MixSharesSql END AS w
              |  FROM d WHERE source IN ($MixSourcesSql)
              |  GROUP BY source),
              |f AS (SELECT g, tok, w, MIN(tok / w) OVER () AS t_feas
              |  FROM t),
              |r AS (SELECT g, w * t_feas / tok AS mix_rate,
              |    LEAST(CAST(FLOOR(w * t_feas / tok * 65536) AS BIGINT),
              |      65535) AS thr
              |  FROM f),
              |kept AS (
              |  SELECT d.source, d.doc_id, d.n_tok, r.mix_rate
              |  FROM d JOIN r ON d.source = r.g
              |  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
              |    < lpad(lower(hex(thr)), 4, '0')),
              |g AS (
              |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |    CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
              |    ROUND(MAX(mix_rate), 6) AS rate,
              |    MIN(doc_id) AS first_doc
              |  FROM kept GROUP BY source)
              |SELECT source, n_docs, tokens_kept, rate, first_doc,
              |  ROUND(tokens_kept / CAST(SUM(tokens_kept) OVER ()
              |    AS DOUBLE), 6) AS achieved_share
              |FROM g ORDER BY source""".stripMargin)),

    // Per-source RELATIVE quality filter: keep each source's top 30%
    // by score (n_chars as the integer quality proxy) — "filter to
    // the best X% of each source", the rank-based sibling of q39's
    // absolute-rule filter. Never sorts the corpus: the per-source
    // 70th-percentile threshold is a |sources|-row agg (exact
    // `percentile` here; `approx_percentile` is the same-plan 100 TB
    // knob), broadcast back as a map-side `>=` filter. Spark's
    // percentile and DuckDB's quantile_cont interpolate identically
    // (a + (b-a)*f on binary64), so the threshold — and the kept doc
    // set — match exactly.
    Q("q108_source_pctl_filter",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val thr = docs.groupBy(col("source"))
          .agg(expr("percentile(n_chars, 0.7)").as("thr"))
        docs.join(broadcast(thr), "source")
          .filter(col("n_chars") >= col("thr"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            min(col("n_chars")).as("min_kept"),
            round(max(col("thr")), 6).as("cutoff"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source, quantile_cont(n_chars, 0.7) AS thr
             |  FROM documents GROUP BY source)
             |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |  CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept,
             |  MIN(d.n_chars) AS min_kept,
             |  ROUND(MAX(t.thr), 6) AS cutoff
             |FROM documents d JOIN t ON d.source = t.source
             |WHERE d.n_chars >= t.thr
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ShardedSink round trip: materialize the corpus as the sharded
    // on-disk layout (shard=XX dirs, rows sorted by the md5 shuffle
    // key inside each shard), then READ THE FILES BACK and verify the
    // durable contract in-plan before aggregating:
    //  - directory shard == substr(md5(doc_id), 1, 2) recomputed from
    //    the row (no row landed in the wrong shard directory);
    //  - shuffle_key == md5(doc_id) (the persisted key is honest);
    //  - within every parquet file, shuffle_key is non-decreasing in
    //    `_metadata.row_index` order (the intra-shard sort survived
    //    the writer) — a per-FILE window, parallel in #files, never a
    //    global sort.
    // Any violation throws via assert_true; otherwise the per-shard
    // aggregate must equal what DuckDB derives from `documents`
    // directly — if the sink dropped, duplicated, or re-bucketed any
    // row, counts/min/max keys diverge and the hash compare fails.
    // This is the durable half of q106: same assignment, proven from
    // the files a trainer's loader would actually read.
    //
    // bench=false: the Spark side materializes 256 shard directories
    // and reads them back (the sink is the thing under test) while the
    // DuckDB oracle computes only the equivalent aggregate — a
    // headline time comparison would be sink-write vs groupBy,
    // apples to oranges. Measured write+readback cost is recorded in
    // PLANS.md (sf1: ~2.9 s for 50 k docs across 256 shards,
    // 5-rep med); correctness stays gated through Verify every round.
    Q("q110_shard_readback",
      (s, dir) => {
        val out = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_q110_shards").getAbsolutePath
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
        ShardedSink.writeSharded(docs, col("doc_id"), out, nibbles = 2)
        ShardedSink.readVerified(s, out, col("doc_id"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("shuffle_key")).as("first_key"),
            max(col("shuffle_key")).as("last_key"))
          .orderBy(col("shard"))
      },
      Some("""SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  MIN(md5(CAST(doc_id AS VARCHAR))) AS first_key,
             |  MAX(md5(CAST(doc_id AS VARCHAR))) AS last_key
             |FROM documents GROUP BY shard
             |ORDER BY shard""".stripMargin),
      bench = false),

    // Token-budget curation: keep the best-scoring docs (score = type/
    // token ratio, a stand-in for any quality-classifier output) whose
    // INCLUSIVE running token total fits a global budget. Spark side is
    // the two-level bucketed prefix sum (operators/BudgetSelect — the
    // corpus never sees a global order); the oracle is the literal
    // single-window cumsum over (score DESC, doc_id), so the
    // hash-match doubles as the decomposition-exactness proof.
    Q("q114_budget_select",
      (s, dir) => {
        import graft.functions.TextFunctions.tokens
        val docs = Tables.load(s, dir, "documents")
        val scored = docs.select(col("doc_id"), col("source"),
            tokenCount(col("text")).as("n_tok"),
            size(array_distinct(tokens(col("text")))).as("n_uniq"))
          .filter(col("n_tok") > 0)
          .withColumn("score",
            col("n_uniq").cast("double") / col("n_tok"))
        graft.operators.BudgetSelect
          .selectByTokenBudget(scored, col("score"), col("n_tok"),
            col("doc_id"), budget = SelectBudget, buckets = 16)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"),
            sum(col("doc_id")).as("id_sum"),
            max(col("cum_tokens")).as("max_cum"))
          .orderBy(col("source"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, source,
              |    CAST(len($duckToks) AS BIGINT) AS n_tok,
              |    CAST(len(list_distinct($duckToks)) AS BIGINT) AS n_uniq
              |  FROM documents),
              |s AS (
              |  SELECT *, CAST(n_uniq AS DOUBLE) / n_tok AS score
              |  FROM t WHERE n_tok > 0),
              |c AS (
              |  SELECT *, SUM(n_tok) OVER (ORDER BY score DESC, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM s)
              |SELECT source,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
              |  MIN(doc_id) AS first_doc,
              |  MAX(doc_id) AS last_doc,
              |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
              |  CAST(MAX(cum) AS BIGINT) AS max_cum
              |FROM c WHERE cum <= $SelectBudget
              |GROUP BY source ORDER BY source""".stripMargin))
  )
}
