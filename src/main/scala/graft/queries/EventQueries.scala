package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time surface over `events`: tumbling-window aggregation,
  * gap-based sessionization, semi-structured props extraction, top-k
  * per entity. These run identically under Structured Streaming (see
  * graft.streaming.EventStreams — same transformations, plus
  * watermarks); the batch forms here are what the DuckDB oracle can
  * check.
  */
object EventQueries extends Catalog {

  // events.value is exactly 2-decimal-valued in the test data (asserted
  // by DataContractSpec), so the money-grid sum applies; off-grid metric
  // data would need a different exact-aggregation strategy.
  import Catalog.{dsumCol => dsum}

  override val queries: Seq[Q] = Seq(

    Q("q60_events_tumbling",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("window_start"), col("event_type")),
      Some(s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
              |  COUNT(*) AS n,
              |  ${Catalog.dsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2
              |ORDER BY window_start, event_type""".stripMargin)),

    // gap-based sessionization: a >30 min silence starts a new session
    Q("q61_events_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          // integer microseconds on both engines — no truncation skew
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull
              || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).as("n_sessions"),
               count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH x AS (
             |  SELECT user_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) > 1800000000
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events)
             |SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
             |  COUNT(*) AS n_events
             |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // sliding event-time windows (1h length, 30min slide) via Spark's
    // native window(); the oracle enumerates the two covering window
    // starts per event with integer-microsecond arithmetic
    Q("q64_events_sliding",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type")),
      Some(s"""WITH w AS (
              |  SELECT event_type, value,
              |    make_timestamp(unnest([
              |      epoch_us(ts) - epoch_us(ts) % 1800000000,
              |      epoch_us(ts) - epoch_us(ts) % 1800000000 - 1800000000
              |    ])) AS window_start
              |  FROM events)
              |SELECT window_start, event_type, COUNT(*) AS n,
              |  ${Catalog.dsum("value")} AS sum_value
              |FROM w GROUP BY 1, 2
              |ORDER BY window_start, event_type""".stripMargin)),

    // full session boundaries: gap>30min starts a session; session id =
    // running count of session starts (exact oracle for the stateful
    // sessionizer's batch semantics)
    Q("q65_events_sessions",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        Tables.load(s, dir, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("new_sess",
            when(lag(col("us"), 1).over(wOrd).isNull
              || col("us") - lag(col("us"), 1).over(wOrd) > 1800L * 1000000L,
              1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts")).as("session_start"),
               max(col("ts")).as("session_end"),
               count(lit(1)).as("n_events"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS session_id
             |  FROM marked)
             |SELECT user_id, session_id,
             |  MIN(ts) AS session_start, MAX(ts) AS session_end,
             |  COUNT(*) AS n_events
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // semi-structured props: extract numeric field via portable regex
    Q("q62_events_props",
      (s, dir) => Tables.load(s, dir, "events")
        .withColumn("k",
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
             max(col("k")).as("max_k"),
             sum(col("k").cast("long")).as("sum_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(MIN(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS INT) AS min_k,
             |  CAST(MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS INT) AS max_k,
             |  CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // as-of join: each click attaches the latest prior purchase of the
    // same user (DuckDB's native ASOF JOIN is the oracle for the
    // engine's composed union-carry-forward operator)
    Q("q66_asof_join",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val purchases = graft.operators.PriorityDedup(
            e.filter(col("event_type") === "purchase"),
            keys = Seq("user_id", "ts"),
            priority = Seq(col("event_id").desc))
          .select(col("user_id"), col("ts"),
                  col("event_id").as("p_event_id"),
                  col("value").as("p_value"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        graft.operators.AsOfJoin.asOf(clicks, purchases, "user_id", "ts",
            Seq("p_event_id", "p_value"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, ts, event_id AS p_event_id, value AS p_value
             |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
             |          ORDER BY event_id DESC) AS rn
             |        FROM events WHERE event_type = 'purchase') t
             |  WHERE rn = 1),
             |c AS (SELECT event_id, user_id, ts, value FROM events
             |      WHERE event_type = 'click')
             |SELECT c.event_id, c.user_id, c.ts, c.value,
             |  p.p_event_id AS asof_p_event_id,
             |  p.p_value AS asof_p_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.user_id, c.ts, c.event_id""".stripMargin)),

    // top event type per user (count desc, type asc tiebreak)
    Q("q63_events_top_type",
      (s, dir) => {
        val counts = Tables.load(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("n"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_type, n FROM (
             |  SELECT user_id, event_type, COUNT(*) AS n,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY COUNT(*) DESC, event_type) AS rn
             |  FROM events GROUP BY user_id, event_type) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // SCD2 change tracking: collapse each user's event-type log into
    // validity intervals (see operators.Scd2 for the scale contract)
    Q("q86_scd2",
      (s, dir) => graft.operators.Scd2.collapse(
          Tables.load(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id")
        .orderBy(col("user_id"), col("seg")),
      Some("""WITH l AS (
             |  SELECT user_id, event_type, ts,
             |    LAG(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev, event_id
             |  FROM events),
             |f AS (SELECT *, CASE WHEN prev IS NULL
             |    OR prev <> event_type THEN 1 ELSE 0 END AS chg FROM l),
             |g AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             |    AS BIGINT) AS seg FROM f),
             |s AS (SELECT user_id, seg, event_type,
             |    MIN(ts) AS valid_from, COUNT(*) AS n_events
             |  FROM g GROUP BY user_id, seg, event_type)
             |SELECT user_id, seg, event_type, valid_from,
             |  LEAD(valid_from) OVER (PARTITION BY user_id
             |    ORDER BY seg) AS valid_to,
             |  n_events
             |FROM s ORDER BY user_id, seg""".stripMargin)),

    // Schema-on-read JSON: from_json with an explicit DDL schema (the
    // typed path — parse once, typed struct out, absent keys surface
    // as typed nulls), vs q62's regexp extraction. Map-only.
    Q("q88_json_parse",
      (s, dir) => Tables.load(s, dir, "events")
        .withColumn("p",
          from_json(col("props"), "k INT, missing INT",
            Map.empty[String, String]))
        .select(col("event_id"), col("p.k").as("k"),
                col("p.k").isNotNull.as("has_k"),
                col("p.missing").as("missing"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             |  json_extract_string(props, '$.k') IS NOT NULL AS has_k,
             |  CAST(json_extract_string(props, '$.missing') AS INTEGER)
             |    AS missing
             |FROM events ORDER BY event_id""".stripMargin)),

    // Time-series densification: per-user daily rollup, calendar
    // gap-fill over each user's own [min, max] span (sequence +
    // explode — spans are bounded per entity, so the generated rows
    // are O(users × days), never a global cross join), zero-fill plus
    // LOCF (last observation carried forward) via an ignore-nulls
    // running last_value. Day surfaces as a yyyy-MM-dd string so the
    // cross-engine compare is representation-stable.
    Q("q89_gap_fill",
      (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"),
               Catalog.dsumCol(col("value")).as("sum_value"))
        val spans = daily.groupBy(col("user_id"))
          .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val cal = spans.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("d"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("user_id", "d"), "left")
          .withColumn("locf_value",
            last(col("sum_value"), ignoreNulls = true).over(w))
          .select(col("user_id"),
                  date_format(col("d"), "yyyy-MM-dd").as("day"),
                  coalesce(col("n"), lit(0L)).as("n"),
                  coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
                  col("locf_value"))
          .orderBy(col("user_id"), col("day"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n,
              |    ${Catalog.dsum("value")} AS sum_value
              |  FROM events GROUP BY 1, 2),
              |spans AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1
              |  FROM daily GROUP BY 1),
              |cal AS (SELECT user_id,
              |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
              |    AS DATE) AS d FROM spans)
              |SELECT c.user_id, strftime(c.d, '%Y-%m-%d') AS day,
              |  COALESCE(n, 0) AS n,
              |  COALESCE(sum_value, 0.0) AS sum_value,
              |  last_value(sum_value IGNORE NULLS) OVER (
              |    PARTITION BY c.user_id ORDER BY c.d
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS locf_value
              |FROM cal c LEFT JOIN daily USING (user_id, d)
              |ORDER BY user_id, day""".stripMargin)),

    // Trailing-window dedup — the batch contract of streaming
    // dropDuplicatesWithinWatermark: an event is a DUP if the same
    // (user_id, event_type) key fired within the previous 10 minutes.
    // Previous-OCCURRENCE semantics (the gap is measured to the
    // immediately preceding event, kept or not — one lag, one pass),
    // NOT kept-anchor semantics (which chains and needs iterative
    // state); the distinction is pinned here so the contract is
    // explicit. Integer-microsecond arithmetic on both engines; one
    // shuffle on the dedup key, per-key order bounded per entity like
    // the sessionizer.
    Q("q118_rolling_dedup",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("kept",
            when(col("prev_us").isNull
              || col("us") - col("prev_us") > 600L * 1000000L, 1L)
              .otherwise(0L))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
               sum(col("kept")).as("n_kept"),
               sum(when(col("kept") === 1, col("event_id")))
                 .as("kept_id_sum"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (
             |  SELECT event_type, event_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id, event_type
             |        ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id, event_type
             |        ORDER BY ts, event_id) > 600000000
             |    THEN 1 ELSE 0 END AS kept
             |  FROM events)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(kept) AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN kept = 1 THEN event_id END)
             |    AS BIGINT) AS kept_id_sum
             |FROM x GROUP BY event_type
             |ORDER BY event_type""".stripMargin))
  )
}
