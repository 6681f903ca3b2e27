package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Common._

/** The reference's ETL transforms (SURVEY.md §2.7) re-expressed as lazy
  * DataFrame chains. Upstream these are row-at-a-time Python workers pulling
  * S3 keys off SQS (activedata_etl/etl.py main loop; transforms registry in
  * activedata_etl/transforms/__init__.py). Here each transform is a
  * declarative plan: parse → explode → normalize (broadcast join) →
  * sessionize (group-agg) → stamp lineage, so Catalyst fuses the scalar
  * stages into one codegen'd pass and the only shuffles are the group-bys.
  *
  * The raw-log parsers (mozlog JSON lines, PERFHERDER_DATA lines, lcov
  * text) live in [[LogParsers]] and are exercised by ScalaTest golden tests
  * over reference-shaped fixtures (FIXTURES.md §B); the queries here run the
  * same shapes over the driver's `events`/`documents`/`lineitem` tables so
  * the DuckDB oracle can gate them.
  */
object Transforms {

  /** T1: sessionize — the unittest-log transform's core shape (upstream:
    * transforms/unittest_logs_to_sorted_table.py): per (run, test) group,
    * derive start/end/duration/failure counts. Strictly a group-agg: no
    * order-dependent state, so it scales as one shuffle on the session key. */
  val etlSessionize: Q = (s, d) =>
    t(s, d, "events")
      .groupBy("user_id")
      .agg(
        min("ts").as("start_ts"),
        max("ts").as("end_ts"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        max(when(col("event_type") === "purchase", true).otherwise(false)).as("has_purchase"),
        r2(sum("value")).as("total_value"))
      .withColumn("duration_s",
        (unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts"))).cast("long"))
      .withColumn("ok", col("n_errors") === 0L)
      .orderBy("user_id")
      .limit(300)

  /** T2: PERFHERDER_DATA extraction (upstream: transforms/
    * perfherder_logs_to_perf_logs.py): scan raw lines for the marker,
    * regex out the JSON payload, parse, stats over replicate values.
    * The z-moment stats (n, Σx, Σx²→var) mirror mo_math/stats.py
    * ZeroMoment — derived from exact integer sums for oracle stability. */
  val etlPerfherder: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("line", concat(lit("12:34:56 INFO - PERFHERDER_DATA: "), col("props")))
      .filter(col("line").contains("PERFHERDER_DATA: "))
      .withColumn("payload", regexp_extract(col("line"), "PERFHERDER_DATA: (.*)", 1))
      .withColumn("k", get_json_object(col("payload"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum("k").as("sum_k"),
        sum(col("k") * col("k")).as("sum_k2"),
        r4(avg("k")).as("mean_k"),
        r4(avg(col("k") * col("k")) - avg("k") * avg("k")).as("var_k"))
      .orderBy("event_type")

  /** T3: property normalization (upstream: imports/buildbot.py — a ~2000-line
    * builder-name → {platform, type, branch} mapping): a broadcast lookup
    * join plus when-chains for the patterned tail (names the table doesn't
    * know). The mapping is built at REALISTIC dimension size — 2000 distinct
    * builder names with derived {platform, build type} attributes, generated
    * deterministically so the DuckDB oracle reconstructs the identical
    * table — and the fact side synthesizes a name per event covering 2200
    * residues, so ~9% of rows exercise the unmatched tail. A few thousand
    * rows of strings is KBs → broadcast; the fact side never shuffles
    * before the final group-by. */
  /** The generated 2000-row builder-name dimension (T3's mapping),
    * shared with the composed [[etlPipeline]]. */
  private def builderDim(s: SparkSession): DataFrame = {
    val plats = Seq("linux64", "win64", "macosx64", "android-arm",
      "linux32", "win32", "macosx-aarch64")
    val btypes = Seq("opt", "debug", "pgo", "asan", "ccov")
    s.range(2000).select(
      concat(lit("builder-"), col("id").cast("string")).as("bname"),
      element_at(array(plats.map(lit): _*), (col("id") % 7).cast("int") + 1)
        .as("platform"),
      element_at(array(btypes.map(lit): _*), (col("id") % 5).cast("int") + 1)
        .as("btype"))
  }

  val etlNormalize: Q = (s, d) => {
    val mapping = builderDim(s)
    val ev = t(s, d, "events").withColumn("bname",
      concat(lit("builder-"), (col("event_id") % 2200).cast("string")))
    ev.join(broadcast(mapping), Seq("bname"), "left")
      .withColumn("platform", coalesce(col("platform"), lit("unknown")))
      .withColumn("btype",
        when(col("btype").isNull && col("value") > 200.0, "hot-unknown")
          .otherwise(coalesce(col("btype"), lit("unknown"))))
      .groupBy("platform", "btype")
      .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
      .orderBy("platform", "btype")
  }

  /** T4: fan-out — one message → N work items (upstream: transforms/
    * pulse_block_to_unittest_logs.py explodes a task's artifact list).
    * `explode` is Spark's native Generator: no custom UDTF needed, and it
    * pipelines inside codegen — no shuffle until the downstream group-by. */
  val etlFanout: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), countDistinct(col("word")).as("n_distinct"))
      .orderBy("doc_id")
      .limit(300)

  /** T5: coverage ingestion (upstream: transforms/gcov_to_es.py — lcov
    * DA:line,hits records → per-file covered/uncovered line arrays).
    * Same shape over lineitem: per file (returnflag), the sorted distinct
    * covered / uncovered "lines" and the coverage percent. The line sets
    * are built as arrays (`collect_set` + numeric `array_sort`) but
    * serialized to comma-joined strings for the compare — the driver's
    * pandas hash can't sort raw array cells (round-3 compare crashed). */
  val etlCoverage: Q = (s, d) => {
    def lineSet(c: org.apache.spark.sql.Column) =
      concat_ws(",", transform(array_sort(collect_set(c)), _.cast("string")))
    t(s, d, "lineitem")
      .select(
        col("l_returnflag").as("source_file"),
        col("l_linenumber").as("line"),
        (col("l_quantity") > 25.0).as("hit"))
      .groupBy("source_file")
      .agg(
        lineSet(when(col("hit"), col("line"))).as("covered"),
        lineSet(when(!col("hit"), col("line"))).as("uncovered"),
        r4(sum(when(col("hit"), 1.0).otherwise(0.0)) / count(lit(1))).as("hit_ratio"))
      .orderBy("source_file")
  }

  /** T6: etl lineage stamping (upstream: transforms/__init__.py wraps every
    * output doc with etl{id, source, timestamp} and S3 keys like
    * "142:1736.0"). Ids must be unique and deterministic but NOT globally
    * sequential — a global row_number forces every row into one window
    * partition. Scale shape: hash-bucket the natural key, number within
    * each bucket, and compose id = bucket·2^32 + rank. All 32 buckets
    * rank in parallel; the id is stable across runs and re-ETL
    * (idempotent overwrite semantics ride on it). */
  val etlLineage: Q = (s, d) => {
    val buckets = 32
    val w = Window.partitionBy("bucket").orderBy("o_orderkey")
    t(s, d, "orders")
      .filter(col("o_orderstatus") === "P")
      .withColumn("bucket", pmod(col("o_orderkey"), lit(buckets)).cast("long"))
      .withColumn("etl_id",
        (col("bucket") * lit(4294967296L) + row_number().over(w)).cast("long"))
      .withColumn("etl_source", lit("orders"))
      .withColumn("etl_key", concat_ws(":", lit("graft"), col("etl_id"), col("o_orderkey")))
      .select("o_orderkey", "etl_id", "etl_source", "etl_key")
      .orderBy("o_orderkey")
      .limit(300)
  }

  /** T7: dead-letter routing as a driver-gated query (upstream: etl.py
    * catches per-key transform failures and re-queues to an error
    * bucket). [[LogParsers.deadLetter]] splits on a validation predicate
    * (payload parses AND passes the range rule); both routes aggregate
    * in one plan — Catalyst shares the scan between the branches, and a
    * null predicate (unparseable payload) routes dead, not ok. */
  val etlDeadLetter: Q = (s, d) => {
    val ev = t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    val (ok, dead) = LogParsers.deadLetter(
      ev, col("k").isNotNull && col("value") <= 300.0, "validation_failed")
    ok.select(lit("ok").as("route"), col("event_id"), col("k"))
      .unionByName(dead.select(lit("dead").as("route"), col("event_id"), col("k")))
      .groupBy("route")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), min("event_id").as("min_id"))
      .orderBy("route")
  }

  /** T-pipeline: the reference's ETL path COMPOSED end-to-end in one plan
    * — validate/route (T7's dead-letter split) → normalize against the
    * broadcast builder dim (T3) → sessionize per (user, platform) (T1's
    * group-agg shape) → stamp deterministic hash-bucketed lineage ids
    * (T6) → assign the daily index route (S7's shape, keyed on session
    * start day). Proves the ETL stages compose without collapsing: one
    * scan of events, the dim broadcast, one session shuffle, 32-way
    * parallel lineage windows — no global window, no driver round-trip. */
  val etlPipeline: Q = (s, d) => {
    val ev = t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    val (ok, _) = LogParsers.deadLetter(
      ev, col("k").isNotNull && col("value") <= 300.0, "validation_failed")
    val norm = ok
      .withColumn("bname",
        concat(lit("builder-"), (col("event_id") % 2200).cast("string")))
      .join(broadcast(builderDim(s)), Seq("bname"), "left")
      .withColumn("platform", coalesce(col("platform"), lit("unknown")))
    val sess = norm.groupBy("user_id", "platform")
      .agg(count(lit(1)).as("n_events"),
        r2(sum("value")).as("total_value"),
        min("ts").as("start_ts"))
    val w = Window.partitionBy("bucket").orderBy("user_id", "platform")
    sess
      .withColumn("bucket", pmod(col("user_id"), lit(32L)))
      .withColumn("etl_id",
        (col("bucket") * lit(4294967296L) + row_number().over(w)).cast("long"))
      .withColumn("idx", concat(lit("sessions-"),
        date_format(date_trunc("day", col("start_ts")), "yyyy.MM.dd")))
      .select("user_id", "platform", "n_events", "total_value", "etl_id", "idx")
      .orderBy("user_id", "platform")
      .limit(300)
  }

  /** T8: trailing z-score anomaly detection — the perf-alerting shape over
    * a raw metric stream (the reference alerts on talos/perfherder series;
    * upstream consumer: MoDataSubscription's alert queries). Each event is
    * scored against the PRECEDING 50 events of its type (frame −50..−1, so
    * the point never smooths itself) and flagged when |z| > 3 with ≥ 20
    * history rows. Cross-engine determinism: the metric is quantized to
    * integer cents FIRST, so n/Σx/Σx² are exact integers (order-independent
    * sums) and μ/σ/z derive from identical operands in both engines — no
    * stddev_samp() accumulation-order drift. One WindowExec pass per
    * event_type: at 100 TB this is a shuffle on the series key and a
    * single sort, no self-join. */
  val etlAnomaly: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(-50, -1)
    t(s, d, "events")
      .withColumn("vi", round(col("value") * 100).cast("long"))
      .withColumn("n", count("vi").over(w))
      .withColumn("s1", sum("vi").over(w))
      .withColumn("s2", sum(col("vi") * col("vi")).over(w))
      .filter(col("n") >= 20)
      .withColumn("mu", col("s1") * lit(1.0) / col("n"))
      .withColumn("sd",
        sqrt((col("n") * col("s2") - col("s1") * col("s1")) * lit(1.0) /
          (col("n") * (col("n") - 1))))
      .filter(col("sd") > 0.0)
      .withColumn("z", (col("vi") - col("mu")) / col("sd"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        r4(col("z")).as("z"), col("n").as("window_n"))
      .orderBy("event_id")
      .limit(500)
  }

  /** T9: cohort retention — classic product-analytics matrix (the
    * reference's ActiveData dashboards slice test activity by landing
    * week). Cohort = the Monday-truncated week of a user's FIRST event
    * (a per-user window min — no join back); offset = whole weeks since;
    * retention = distinct active users / the cohort's week-0 size (itself
    * a window max over the grouped frame, so the whole thing is one
    * group-by plus two KB-scale windows). All-integer until the final
    * ratio. */
  val etlCohort: Q = (s, d) => {
    val uw = Window.partitionBy("user_id")
    val cw = Window.partitionBy("cohort_week")
    t(s, d, "events")
      .withColumn("week", date_trunc("week", col("ts")))
      .withColumn("cohort_week", min("week").over(uw))
      .withColumn("week_offset",
        (datediff(col("week").cast("date"), col("cohort_week").cast("date"))
          / 7).cast("int"))
      .groupBy(col("cohort_week").cast("date").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(cw))
      .withColumn("retention", r4(col("n_active") * lit(1.0) / col("cohort_size")))
      .select("cohort_week", "week_offset", "n_active", "cohort_size", "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** T10: SCD-2 history construction from a change log — the
    * slowly-changing-dimension merge every warehouse ETL needs (the
    * reference re-indexes mutable task records into ES daily; the
    * versioned-row form is how a columnar store keeps that history
    * queryable). Each customer's orders are its change events: one window
    * pass derives [valid_from, valid_to) via lead(), version numbers via
    * row_number(), and the open-ended current row — one shuffle on the
    * natural key, no self-join, scale-invariant. */
  val etlScd2: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t(s, d, "orders")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead("o_orderdate", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("o_custkey"), col("version"), col("valid_from"),
        col("valid_to"), col("is_current"), r2(col("o_totalprice")).as("price"))
      .orderBy("o_custkey", "version")
      .limit(500)
  }

  val queries: Map[String, Q] = Map(
    "etl_anomaly" -> etlAnomaly,
    "etl_cohort" -> etlCohort,
    "etl_scd2" -> etlScd2,
    "etl_pipeline" -> etlPipeline,
    "etl_unittest_sessionize" -> etlSessionize,
    "etl_perfherder" -> etlPerfherder,
    "etl_normalize" -> etlNormalize,
    "etl_fanout" -> etlFanout,
    "etl_coverage" -> etlCoverage,
    "etl_lineage" -> etlLineage,
    "etl_dead_letter" -> etlDeadLetter)

  val oracle: Map[String, String] = Map(
    "etl_anomaly" ->
      """WITH q AS (
           SELECT event_id, event_type, ts, value,
                  CAST(round(value * 100) AS BIGINT) AS vi
           FROM events),
         st AS (
           SELECT event_id, event_type, value, vi,
                  count(vi) OVER w AS n,
                  sum(vi) OVER w AS s1,
                  sum(vi * vi) OVER w AS s2
           FROM q
           WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)),
         scored AS (
           SELECT event_id, event_type, value, n,
                  sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1))) AS sd,
                  vi - s1 * 1.0 / n AS dev
           FROM st WHERE n >= 20)
         SELECT event_id, event_type, round(value, 2) AS value,
                round(dev / sd, 4) AS z, n AS window_n
         FROM scored
         WHERE sd > 0.0 AND abs(dev / sd) > 3.0
         ORDER BY event_id LIMIT 500""",
    "etl_cohort" ->
      """WITH e AS (
           SELECT user_id, date_trunc('week', ts) AS week FROM events),
         c AS (
           SELECT user_id, week,
                  min(week) OVER (PARTITION BY user_id) AS cohort_week
           FROM e),
         g AS (
           SELECT CAST(cohort_week AS DATE) AS cohort_week,
                  CAST(date_diff('day', CAST(cohort_week AS DATE),
                                 CAST(week AS DATE)) / 7 AS INT) AS week_offset,
                  count(DISTINCT user_id) AS n_active
           FROM c GROUP BY 1, 2),
         sz AS (
           SELECT *, max(CASE WHEN week_offset = 0 THEN n_active END)
                       OVER (PARTITION BY cohort_week) AS cohort_size
           FROM g)
         SELECT cohort_week, week_offset, n_active, cohort_size,
                round(n_active * 1.0 / cohort_size, 4) AS retention
         FROM sz ORDER BY cohort_week, week_offset""",
    "etl_scd2" ->
      """SELECT o_custkey,
                CAST(row_number() OVER w AS INT) AS version,
                o_orderdate AS valid_from,
                lead(o_orderdate, 1) OVER w AS valid_to,
                lead(o_orderdate, 1) OVER w IS NULL AS is_current,
                round(o_totalprice, 2) AS price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, version LIMIT 500""",
    "etl_pipeline" ->
      """WITH ev AS (SELECT *,
                            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                     FROM events),
           ok AS (SELECT * FROM ev WHERE k IS NOT NULL AND value <= 300.0),
           mapping AS (
             SELECT 'builder-' || CAST(i AS VARCHAR) AS bname,
                    ['linux64','win64','macosx64','android-arm',
                     'linux32','win32','macosx-aarch64'][CAST(i % 7 AS INT) + 1]
                      AS platform
             FROM range(2000) t(i)),
           norm AS (
             SELECT o.user_id, o.ts, o.value,
                    coalesce(m.platform, 'unknown') AS platform
             FROM ok o LEFT JOIN mapping m
               ON m.bname = 'builder-' || CAST(o.event_id % 2200 AS VARCHAR)),
           sess AS (
             SELECT user_id, platform,
                    count(*) AS n_events,
                    round(sum(value), 2) AS total_value,
                    min(ts) AS start_ts
             FROM norm GROUP BY 1, 2),
           ranked AS (
             SELECT *, user_id % 32 AS bucket,
                    row_number() OVER (PARTITION BY user_id % 32
                                       ORDER BY user_id, platform) AS rn
             FROM sess)
         SELECT user_id, platform, n_events, total_value,
                CAST(bucket * 4294967296 + rn AS BIGINT) AS etl_id,
                'sessions-' || strftime(date_trunc('day', start_ts), '%Y.%m.%d') AS idx
         FROM ranked
         ORDER BY user_id, platform LIMIT 300""",
    "etl_unittest_sessionize" ->
      """SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
                count(*) AS n_events,
                CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
                bool_or(event_type = 'purchase') AS has_purchase,
                round(sum(value), 2) AS total_value,
                CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s,
                count(*) FILTER (WHERE event_type = 'error') = 0 AS ok
         FROM events GROUP BY user_id ORDER BY user_id LIMIT 300""",
    "etl_perfherder" ->
      """WITH lines AS (
           SELECT event_type,
                  '12:34:56 INFO - PERFHERDER_DATA: ' || props AS line
           FROM events),
           parsed AS (
           SELECT event_type,
                  CAST(json_extract_string(
                    regexp_extract(line, 'PERFHERDER_DATA: (.*)', 1), '$.k') AS BIGINT) AS k
           FROM lines WHERE contains(line, 'PERFHERDER_DATA: '))
         SELECT event_type, count(k) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                CAST(sum(k * k) AS BIGINT) AS sum_k2,
                round(avg(k), 4) + 0.0 AS mean_k,
                round(avg(k * k) - avg(k) * avg(k), 4) + 0.0 AS var_k
         FROM parsed GROUP BY event_type ORDER BY event_type""",
    "etl_normalize" ->
      """WITH mapping AS (
           SELECT 'builder-' || CAST(i AS VARCHAR) AS bname,
                  ['linux64','win64','macosx64','android-arm',
                   'linux32','win32','macosx-aarch64'][CAST(i % 7 AS INT) + 1]
                    AS platform,
                  ['opt','debug','pgo','asan','ccov'][CAST(i % 5 AS INT) + 1]
                    AS btype
           FROM range(2000) t(i)),
         ev AS (SELECT 'builder-' || CAST(event_id % 2200 AS VARCHAR) AS bname,
                       value
                FROM events)
         SELECT coalesce(m.platform, 'unknown') AS platform,
                CASE WHEN m.btype IS NULL AND e.value > 200.0 THEN 'hot-unknown'
                     ELSE coalesce(m.btype, 'unknown') END AS btype,
                count(*) AS n, round(sum(e.value), 2) AS sum_value
         FROM ev e LEFT JOIN mapping m USING (bname)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "etl_fanout" ->
      """SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE length(word) > 0
         GROUP BY doc_id ORDER BY doc_id LIMIT 300""",
    "etl_coverage" ->
      """SELECT l_returnflag AS source_file,
                coalesce(array_to_string(list(DISTINCT l_linenumber ORDER BY l_linenumber)
                  FILTER (WHERE l_quantity > 25.0), ','), '') AS covered,
                coalesce(array_to_string(list(DISTINCT l_linenumber ORDER BY l_linenumber)
                  FILTER (WHERE NOT l_quantity > 25.0), ','), '') AS uncovered,
                round(count(*) FILTER (WHERE l_quantity > 25.0) * 1.0 / count(*), 4) AS hit_ratio
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "etl_dead_letter" ->
      """WITH ev AS (SELECT event_id, value,
                            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                     FROM events),
           routed AS (SELECT CASE WHEN k IS NOT NULL AND value <= 300.0
                                  THEN 'ok' ELSE 'dead' END AS route,
                             event_id, k
                      FROM ev)
         SELECT route, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
                min(event_id) AS min_id
         FROM routed GROUP BY route ORDER BY route""",
    "etl_lineage" ->
      """WITH ranked AS (
           SELECT o_orderkey, o_orderkey % 32 AS bucket,
                  row_number() OVER (PARTITION BY o_orderkey % 32
                                     ORDER BY o_orderkey) AS rn
           FROM orders WHERE o_orderstatus = 'P')
         SELECT o_orderkey,
                CAST(bucket * 4294967296 + rn AS BIGINT) AS etl_id,
                'orders' AS etl_source,
                concat_ws(':', 'graft',
                          CAST(bucket * 4294967296 + rn AS BIGINT),
                          o_orderkey) AS etl_key
         FROM ranked ORDER BY o_orderkey LIMIT 300""")
}
