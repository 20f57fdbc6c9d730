package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.1-§2.6) re-expressed over
  * the driver's testdata tables. Each query demonstrates one operator family
  * from the reference and is paired with DuckDB oracle SQL.
  *
  * Scale notes: every query here is either narrow (projection/filter — no
  * shuffle, pushed into the parquet scan) or a single hash aggregation with
  * map-side partial agg; sorts before the sink are for oracle determinism
  * and would be dropped (or replaced by a top-k TakeOrdered) in production.
  */
object RelationalQueries extends QueryPack {

  /** silver_jobs-shaped bronze frame derived deterministically from the
    * events table (the q_hot_gpus convention — events plays the raw
    * telemetry, and the derivation is replayed bit-for-bit by the DuckDB
    * oracle): each event is one job record. user_id is the submitting
    * user; the job starts at ts (floor-second epoch); 'error' events
    * Failed; NULL-value events are still Running (no end_time, so
    * Silver.jobs leaves run_time_sec NULL); everything else Completed
    * after floor(value·60) seconds. Feeds the Marts.* efficiency-mart
    * queries through the REAL Silver.jobs projection, so the oracle
    * hash covers the bronze→silver→mart chain, not a test double.
    */
  private def jobEvents(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(
      concat(lit("job_"), col("event_id")).as("job_name"),
      col("event_id").as("inst_id"),
      col("user_id").as("user"),
      when(col("value").isNull, lit("Running"))
        .when(col("event_type") === "error", lit("Failed"))
        .otherwise(lit("Completed")).as("status"),
      unix_timestamp(col("ts")).as("start_time"),
      when(col("value").isNotNull,
        unix_timestamp(col("ts")) + floor(col("value") * 60).cast("long"))
        .otherwise(lit(null).cast("long")).as("end_time"))

  val queries: Map[String, Q] = Map(
    // The reference's future-work efficiency marts (README "Job- and
    // User-Level Efficiency Marts") as first-class oracled queries:
    // gold_user_gpu_usage_daily off the derived silver_jobs. Running
    // jobs count as jobs but contribute zero hours (NULL run_time_sec
    // coalesced) — the mart's load-bearing CASE, exercised because
    // NULL-value events map to Running.
    "q_user_usage_daily" -> ((s, d) =>
      graft.telemetry.Marts.userUsageDaily(
        graft.telemetry.Silver.jobs(jobEvents(s, d)))),

    // gold_job_efficiency_daily: allocated hours from the jobs mart ×
    // the day's average utilization from the REAL Gold.clusterUtilDaily
    // (events.value plays gpu_util_pct) — the day-grain broadcast join
    // the reference sketches. dt cast to DATE for the oracle compare.
    "q_job_efficiency_daily" -> ((s, d) => {
      val jobs = graft.telemetry.Silver.jobs(jobEvents(s, d))
      val gold = graft.telemetry.Gold.clusterUtilDaily(
        Tables.events(s, d).select(
          unix_timestamp(col("ts")).as("ts"),
          col("value").as("gpu_util_pct"),
          col("value").as("cpu_util_pct")))
      graft.telemetry.Marts.jobEfficiencyDaily(jobs, gold)
        .withColumn("dt", to_date(col("dt")))
    }),

    // P1-P4: rename projection + IS NOT NULL filter (reference
    // silver_gpu_timeseries.sql:7-37 shape) on the events table.
    "q_project_rename" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id").as("metric_id"),
          col("user_id").as("machine_id"),
          col("event_type").as("metric_kind"),
          col("value"))
        .filter(col("value").isNotNull)
        .orderBy("metric_id")),

    // E1/E2/E6: CASE WHEN + arithmetic + comparison→int flag (reference
    // silver_jobs.sql:25-28, score_cluster_anomalies.py:47).
    "q_case_arith" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("net_price"),
          when(col("l_returnflag") === "R", col("l_extendedprice"))
            .otherwise(lit(null)).as("returned_price"),
          (col("l_returnflag") === "R").cast("int").as("is_returned"))
        .orderBy("l_orderkey", "l_linenumber")),

    // A1-A3 + E3/E4: the reference's flagship gold daily aggregate
    // (gold_cluster_util_daily.sql:5-31) — day-truncated groupBy with
    // avg + exact interpolated p95. events.value plays gpu_util_pct.
    "q_gold_daily" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(
          to_date(date_trunc("day", col("ts"))).as("dt"),
          col("value"))
        .groupBy("dt")
        .agg(
          round(avg("value"), 6).as("avg_value"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95_value"),
          count(lit(1)).as("n_events"))
        .orderBy("dt")),

    // A1 multi-key + filter pushdown: TPC-H Q1-shaped pricing summary.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6 (forecasting revenue change): the pure scan-aggregate
    // showcase — every predicate (date range, discount band, quantity
    // cut) must reach the parquet scan as a pushed filter, the aggregate
    // is one partial+final pass, and NOTHING shuffles but the single
    // scalar. The 100-TB plan is scan → filter → 2-row exchange.
    "q_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))),

    // E3-E5 extension: calendar decomposition + date arithmetic (year/
    // quarter/month/day, month-shift, month-end) — the rest of the date
    // toolbox the reference's day-bucketing implies.
    "q_date_parts" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          to_date(add_months(col("o_orderdate"), 3)).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")),

    // String toolbox: case folding, slicing, replace, reverse, padding —
    // the scalar-string surface (reference has none; NEW).
    "q_string_funcs" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_name"), "Customer", "Cst").as("name_short"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          length(col("c_name")).as("name_len"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"))
        .orderBy("c_custkey")),

    // A4: ungrouped summary aggregate (reference README.md:531-532).
    "q_agg_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("total_rows"))),

    // O1-O3: global sort + limit (top-k; Spark plans TakeOrderedAndProject —
    // no full sort materialization).
    "q_sort_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // A6: dbt `unique` test shape — duplicate keys (must be empty).
    "q_check_unique" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("o_orderkey")),

    // A7: dbt `not_null` test shape — count of violations.
    "q_check_not_null" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(
          sum(col("o_orderkey").isNull.cast("long")).as("null_orderkey"),
          sum(col("o_custkey").isNull.cast("long")).as("null_custkey"))),

    // Data-profiling summary (describe()-style, deterministic): row and
    // null counts, exact distincts, value ranges — the quality dashboard
    // every table gets, in one aggregation pass.
    "q_profile" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
          countDistinct(col("o_orderstatus")).as("n_status"),
          countDistinct(col("o_orderpriority")).as("n_priorities"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"),
          round(avg(col("o_totalprice")), 2).as("avg_price"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))),

    // Footer-only statistics scan: count/min/max answered from parquet
    // ROW-GROUP METADATA via DSv2 aggregate pushdown — at 100 TB this is
    // the difference between reading footers and reading the table. Runs
    // in a scoped newSession (pushdown needs the v2 parquet source);
    // PlanSpec asserts PushedAggregation actually appears in the scan —
    // a silent fallback would still be correct, just 1000× the IO.
    "q_agg_pushdown" -> ((s, d) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("count(*) AS n_rows",
          "min(l_orderkey) AS min_orderkey",
          "max(l_orderkey) AS max_orderkey",
          "min(l_linenumber) AS min_line",
          "max(l_linenumber) AS max_line")
    }),

    // dbt `accepted_values` test shape: per-value row counts outside the
    // accepted domain (must be empty).
    "q_check_accepted_values" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isNotNull &&
          !col("event_type").isin("click", "view", "purchase", "signup", "error"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Richer GPU-level metrics marts (reference README "Richer GPU-Level
    // Metrics" future work): deterministic simulated temp/power/
    // throttle/ECC columns over the telemetry-shaped events table
    // (user_id plays machine_id, value plays gpu_util_pct), then the two
    // sketched gold tables. Simulation rules live in GpuMetrics.enrich
    // and are replayed bit-for-bit by the DuckDB oracle.
    "q_hot_gpus" -> ((s, d) =>
      graft.telemetry.GpuMetrics.hotGpus(
          graft.telemetry.GpuMetrics.enrich(
            Tables.events(s, d).filter(col("value").isNotNull),
            "user_id", "event_id", "value"),
          "user_id")
        .orderBy("machine_id")),

    "q_error_spikes" -> ((s, d) =>
      graft.telemetry.GpuMetrics.errorSpikesDaily(
          graft.telemetry.GpuMetrics.enrich(
            Tables.events(s, d), "user_id", "event_id", "value"),
          "ts")
        .orderBy("dt")),

    // dbt `relationships` test shape: orphan-FK counts for the star
    // schema's two load-bearing edges (must both be zero) — anti-join on
    // keys only, parent side broadcast.
    "q_check_relationships" -> ((s, d) => {
      val orphanOrders = Tables.orders(s, d)
        .select(col("o_custkey").as("fk")).filter(col("fk").isNotNull)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey").as("fk")).distinct()), Seq("fk"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
        .select(lit("orders.o_custkey->customer").as("edge"), col("orphans"))
      val orphanLines = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("fk")).filter(col("fk").isNotNull)
        .join(Tables.orders(s, d)
          .select(col("o_orderkey").as("fk")).distinct(), Seq("fk"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
        .select(lit("lineitem.l_orderkey->orders").as("edge"), col("orphans"))
      orphanOrders.union(orphanLines).orderBy("edge")
    }))

  val oracle: Map[String, String] = Map(
    "q_user_usage_daily" ->
      """WITH jobs AS (
        |  SELECT user_id,
        |         CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         CASE WHEN value IS NULL THEN 'Running'
        |              WHEN event_type = 'error' THEN 'Failed'
        |              ELSE 'Completed' END AS job_status,
        |         CASE WHEN value IS NULL THEN NULL
        |              ELSE CAST(floor(value * 60) AS BIGINT) END AS run_time_sec
        |  FROM events)
        |SELECT user_id, dt,
        |       count(*) AS n_jobs,
        |       CAST(sum(CAST(job_status = 'Failed' AS BIGINT)) AS BIGINT) AS n_failed,
        |       round(avg(CAST(job_status = 'Failed' AS DOUBLE)), 6) AS failure_rate,
        |       round(sum(coalesce(run_time_sec, 0)) / 3600.0, 6) AS run_hours
        |FROM jobs GROUP BY 1, 2 ORDER BY user_id, dt""".stripMargin,
    "q_job_efficiency_daily" ->
      """WITH j AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         count(*) AS n_jobs,
        |         CAST(sum(CAST(floor(value * 60) AS BIGINT)) AS DOUBLE) AS alloc_sec
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |g AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         avg(value) AS avg_gpu_util
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT j.dt AS dt, n_jobs,
        |       round(alloc_sec / 3600.0, 6) AS gpu_hours_allocated,
        |       round(alloc_sec / 3600.0 * avg_gpu_util / 100.0, 6) AS gpu_hours_active,
        |       round(avg_gpu_util / 100.0, 6) AS efficiency
        |FROM j LEFT JOIN g ON j.dt = g.dt ORDER BY dt""".stripMargin,
    "q_project_rename" ->
      """SELECT event_id AS metric_id, user_id AS machine_id,
        |       event_type AS metric_kind, value
        |FROM events WHERE value IS NOT NULL ORDER BY metric_id""".stripMargin,
    "q_case_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount), 4) AS net_price,
        |       CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE NULL END AS returned_price,
        |       CAST(l_returnflag = 'R' AS INT) AS is_returned
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_gold_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |       round(avg(value), 6) AS avg_value,
        |       round(quantile_cont(value, 0.95), 6) AS p95_value,
        |       count(*) AS n_events
        |FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY dt""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q_date_parts" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m, day(o_orderdate) AS dom,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  replace(c_name, 'Customer', 'Cst') AS name_short,
        |  reverse(c_mktsegment) AS seg_rev,
        |  length(c_name) AS name_len,
        |  lpad(c_custkey::VARCHAR, 10, '0') AS key_padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_agg_summary" ->
      """SELECT round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS total_rows
        |FROM lineitem""".stripMargin,
    "q_sort_limit" ->
      """SELECT * FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_check_unique" ->
      """SELECT o_orderkey, count(*) AS n FROM orders
        |GROUP BY o_orderkey HAVING count(*) > 1 ORDER BY o_orderkey""".stripMargin,
    "q_check_not_null" ->
      """SELECT CAST(sum(CAST(o_orderkey IS NULL AS BIGINT)) AS BIGINT) AS null_orderkey,
        |       CAST(sum(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT) AS null_custkey
        |FROM orders""".stripMargin,
    "q_agg_pushdown" ->
      """SELECT count(*) AS n_rows,
        |  min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
        |  min(l_linenumber) AS min_line, max(l_linenumber) AS max_line
        |FROM lineitem""".stripMargin,
    "q_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT) AS null_custkey,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(avg(o_totalprice), 2) AS avg_price,
        |  min(o_orderdate) AS first_date,
        |  max(o_orderdate) AS last_date
        |FROM orders""".stripMargin,
    "q_check_accepted_values" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type IS NOT NULL
        |  AND event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_hot_gpus" ->
      """WITH e AS (
        |  SELECT user_id AS machine_id,
        |         30 + 0.45 * value AS temp_c,
        |         80 + 2.2 * value AS power_w,
        |         CAST(value > 85 AS INT) AS throttled
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT machine_id, count(*) AS n_samples,
        |         round(avg(temp_c), 6) AS avg_temp_c,
        |         round(max(temp_c), 6) AS max_temp_c,
        |         round(avg(power_w), 6) AS avg_power_w,
        |         round(avg(CAST(throttled AS DOUBLE)), 6) AS throttle_rate
        |  FROM e GROUP BY 1)
        |SELECT machine_id, n_samples, avg_temp_c, max_temp_c, avg_power_w,
        |       throttle_rate,
        |       CAST(avg_temp_c > 56.0 AS INT) AS is_hot,
        |       CAST(throttle_rate > 0.2 AS INT) AS is_throttled
        |FROM m WHERE avg_temp_c > 56.0 OR throttle_rate > 0.2
        |ORDER BY machine_id""".stripMargin,
    "q_error_spikes" ->
      """WITH e AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
        |         CASE substr(md5(user_id || ':' || CAST(event_id AS VARCHAR)), 1, 1)
        |           WHEN 'f' THEN 3 WHEN 'e' THEN 1 ELSE 0 END AS ecc
        |  FROM events),
        |d AS (
        |  SELECT dt, CAST(sum(ecc) AS BIGINT) AS total_ecc,
        |         count(*) FILTER (ecc > 0) AS err_events
        |  FROM e GROUP BY 1),
        |z AS (
        |  SELECT dt, total_ecc, err_events,
        |         avg(total_ecc) OVER () AS mu,
        |         stddev_pop(total_ecc) OVER () AS sd
        |  FROM d)
        |SELECT dt, total_ecc, err_events FROM z
        |WHERE total_ecc > mu + sd ORDER BY dt""".stripMargin,
    "q_check_relationships" ->
      """SELECT 'orders.o_custkey->customer' AS edge,
        |       count(*) FILTER (o_custkey IS NOT NULL AND o_custkey NOT IN
        |         (SELECT c_custkey FROM customer)) AS orphans
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders' AS edge,
        |       count(*) FILTER (l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |         (SELECT o_orderkey FROM orders)) AS orphans
        |FROM lineitem
        |ORDER BY edge""".stripMargin)
}
