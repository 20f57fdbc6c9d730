package graft.queries

import graft.Tables
import graft.text.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics surface: semi-structured JSON extraction, batch
  * sessionization (the windowed twin of the streaming
  * flatMapGroupsWithState sessionizer), and explode-based aggregation.
  *
  * Scale notes: JSON extraction is a narrow per-row transform (codegen'd
  * JsonPath, no shuffle); sessionization shuffles once on user_id and
  * computes both windows over that single exchange (same partitioning →
  * no second shuffle); wordcount shuffles (token, 1) pairs with map-side
  * partial aggregation — the explode never carries document text, only
  * tokens.
  */
object EventQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Semi-structured: parse props JSON, extract k, profile per event type.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          round(avg("k"), 6).as("avg_k"),
          min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type")),

    // Regular-grid resampling + forward fill (operators.TimeSeries): the
    // dense hourly per-user timeline the sparse bucket aggregate drops —
    // grid rows are SPAN-sized (720/key/month however big the raw volume
    // gets), the fill is one per-key window, and the only corpus-sized
    // pass is the bucket aggregate. 20 keys keep the fixture result
    // compact; the operator is key-parallel by construction.
    "q_ts_resample" -> ((s, d) =>
      graft.operators.TimeSeries.resampleFill(
          Tables.events(s, d).filter(col("user_id") < 20),
          "user_id", "ts", "value", "hour", "INTERVAL 1 HOUR")
        .orderBy("user_id", "bucket")),

    // Batch sessionization: per-user sessions split at >30-minute gaps;
    // one shuffle (user_id), both window passes reuse it.
    "q_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      Tables.events(s, d)
        .withColumn("gap_sec",
          col("ts").cast("double") - lag(col("ts").cast("double"), 1)
            .over(byUser))
        .withColumn("is_new",
          when(col("gap_sec").isNull || col("gap_sec") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum("is_new").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          round(max(col("ts").cast("double")) - min(col("ts").cast("double")), 6)
            .as("duration_sec"),
          round(sum("value"), 4).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // The NATIVE session-window operator (same 30-minute gap rule as the
    // manual lag/cumsum q_sessionize — one shuffle, sessions assembled
    // inside the aggregation). Boundary nuance: session_window treats a
    // gap of EXACTLY the timeout as a new session (windows are
    // half-open), the manual formulation keeps it — the oracle encodes
    // the half-open rule; fixture timestamps are microsecond-valued so
    // exact-boundary gaps cannot occur.
    "q_sessionize_native" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")),

    // CDC compaction: current state per user = latest event (max ts,
    // event_id tiebreak via the struct's ts ordering is insufficient —
    // ts is unique per event in the fixture; deterministic here).
    "q_latest_by_key" -> ((s, d) =>
      graft.operators.Cdc.latestByKey(
          Tables.events(s, d)
            .select("user_id", "event_id", "ts", "event_type", "value"),
          Seq("user_id"), "event_id")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          round(col("value"), 4).as("last_value"))
        .orderBy("user_id")),

    // Retention cohorts: users grouped by first-seen day, then distinct
    // active users counted k days after their cohort day — the matrix
    // behind every retention curve. Two aggregations (first-seen, then
    // cohort×offset) and one join; the cohort table is one row per user
    // and joins broadcast-or-shuffled by size, both linear.
    "q_retention_cohorts" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          to_date(date_trunc("day", col("ts"))).as("day"))
        .distinct()
      val cohorts = days.groupBy("user_id").agg(min("day").as("cohort"))
      days.join(cohorts, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("k"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort", "k")
    }),

    // Whole-row MERGE upsert (Cdc.upsertByKey): updated rows win on key
    // collision, new keys insert, untouched rows pass the anti-join —
    // the logical MERGE INTO every CDC sink runs (a table format adds
    // file pruning on top; the semantics are exactly this and the
    // oracle checks them).
    "q_merge_upsert" -> ((s, d) => {
      val target = Tables.customer(s, d)
      val updates = target.filter(col("c_custkey") % 4 === 1)
        .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
          col("c_nationkey"),
          round(col("c_acctbal") + 1000.0, 2).as("c_acctbal"),
          col("c_mktsegment"))
      val inserts = target.filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      graft.operators.Cdc.upsertByKey(target,
          updates.unionByName(inserts), Seq("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // SCD Type 2 (Cdc.scd2): the purchase log becomes a versioned
    // history — [valid_from, valid_to) intervals per user with the open
    // current version flagged. One window exchange; event_id tiebreak
    // makes same-timestamp versions deterministic.
    "q_scd2" -> ((s, d) =>
      graft.operators.Cdc.scd2(
          Tables.events(s, d).filter(col("event_type") === "purchase")
            .select("user_id", "event_id", "ts"),
          Seq("user_id"), "ts", tiebreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from", "event_id")),

    // Conversion attribution: purchases joined to the same user's clicks
    // within the preceding 30 minutes. Runs the EXACT streaming operator
    // (StreamingTelemetry.attributionJoin) on batch frames — the unified
    // Dataset engine means one expression serves both, and this hash
    // check plus StreamingSpec's stream/batch parity test together pin
    // the streaming semantics to the DuckDB oracle.
    "q_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.StreamingTelemetry.attributionJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          horizon = "30 minutes")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          round(col("value"), 4).as("purchase_value"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // Ordered event funnel on first occurrences: of the users who signed
    // up, how many later clicked, and of those how many later purchased
    // — the classic product-analytics funnel as ONE aggregation pass
    // (per-user conditional min-ts pivot, then stage predicates over the
    // three minimums; no self-joins, no window).
    "q_funnel_steps" -> ((s, d) => {
      val firsts = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("s_ts"),
          min(when(col("event_type") === "click", col("ts"))).as("c_ts"),
          min(when(col("event_type") === "purchase", col("ts"))).as("p_ts"))
      firsts.agg(
        sum(col("s_ts").isNotNull.cast("long")).as("n_signup"),
        sum((col("s_ts").isNotNull && col("c_ts") > col("s_ts"))
          .cast("long")).as("n_then_click"),
        sum((col("s_ts").isNotNull && col("c_ts") > col("s_ts") &&
          col("p_ts") > col("c_ts")).cast("long")).as("n_then_purchase"))
    }),

    // Explode-based wordcount: top-100 corpus tokens.
    "q_wordcount" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)))

  val oracle: Map[String, String] = Map(
    "q_ts_resample" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |         round(avg(value), 6) AS v_obs
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |  FROM b GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        |  FROM span),
        |j AS (
        |  SELECT g.user_id, g.bucket, b.v_obs
        |  FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.bucket = b.bucket)
        |SELECT user_id, bucket,
        |       last_value(v_obs IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        |       CASE WHEN v_obs IS NOT NULL THEN 1 ELSE 0 END AS observed
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_sec
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN gap_sec IS NULL OR gap_sec > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts, value,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       round(max(epoch(ts)) - min(epoch(ts)), 6) AS duration_sec,
        |       round(sum(value), 4) AS session_value
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q_sessionize_native" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_sec
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN gap_sec IS NULL OR gap_sec >= 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start,
        |       count(*) AS n_events,
        |       round(sum(value), 4) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_latest_by_key" ->
      """SELECT user_id,
        |       arg_max(event_id, event_id) AS last_event_id,
        |       arg_max(event_type, event_id) AS last_event_type,
        |       round(arg_max(value, event_id), 4) AS last_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // twin of q_retention_cohorts: same distinct-activity → first-seen →
    // cohort×offset aggregation chain
    "q_retention_cohorts" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
        |SELECT f.cohort, datediff('day', f.cohort, a.day) AS k,
        |       count(DISTINCT a.user_id) AS n_active
        |FROM act a JOIN first f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, k""".stripMargin,
    // twin of q_merge_upsert: updates+inserts take precedence, the rest
    // of the target passes through the NOT IN (key is non-null)
    "q_merge_upsert" ->
      """WITH upd AS (
        |  SELECT c_custkey, upper(c_name) AS c_name,
        |         round(c_acctbal + 1000.0, 2) AS c_acctbal
        |  FROM customer WHERE c_custkey % 4 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT c_custkey, c_name, c_acctbal FROM upd
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |ORDER BY c_custkey""".stripMargin,
    // twin of q_scd2: lead() over (ts, event_id) gives the next
    // version's start; null lead = open current version
    "q_scd2" ->
      """SELECT user_id, event_id, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS INT) AS is_current
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "q_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       round(p.value, 4) AS purchase_value
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "q_funnel_steps" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CAST(s_ts IS NOT NULL AS BIGINT)) AS BIGINT) AS n_signup,
        |  CAST(sum(CAST(s_ts IS NOT NULL AND c_ts > s_ts AS BIGINT)) AS BIGINT)
        |    AS n_then_click,
        |  CAST(sum(CAST(s_ts IS NOT NULL AND c_ts > s_ts AND p_ts > c_ts
        |    AS BIGINT)) AS BIGINT) AS n_then_purchase
        |FROM f""".stripMargin,
    "q_wordcount" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        x -> x <> '')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)
}
