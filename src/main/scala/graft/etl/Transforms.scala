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

  /** T11: event FUNNEL — ordered-step conversion (view → click →
    * purchase), the product-analytics query every event warehouse runs.
    * Step k's timestamp is the user's first step-k event AT OR AFTER the
    * step-(k-1) timestamp, so ordering is enforced by semantics, not by
    * sorting the stream: three user-keyed group-bys + two equi-joins on
    * user_id (each side already reduced to one row per user — KB-scale at
    * any corpus size once user partials collapse map-side). All-integer
    * output: counts and `div`-based per-mille conversions plus the mean
    * seconds-from-first-view per step, so the oracle compare is exact. */
  def funnelOf(ev: DataFrame): DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"), min("v_ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"), min("v_ts").as("v_ts"))
    def sec(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      unix_timestamp(a) - unix_timestamp(b)
    val row = v.agg(count(lit(1)).as("n_view")).crossJoin(
      c.agg(count(lit(1)).as("n_click"),
        sum(sec(col("c_ts"), col("v_ts"))).as("s_click"))).crossJoin(
      p.agg(count(lit(1)).as("n_purchase"),
        sum(sec(col("p_ts"), col("v_ts"))).as("s_purchase")))
    row.select(expr(
      """stack(3,
           1, 'view',     n_view,     1000L,
              CAST(1000 * n_view div n_view AS BIGINT), 0L,
           2, 'click',    n_click,
              CAST(1000 * n_click div n_view AS BIGINT),
              CAST(1000 * n_click div n_view AS BIGINT),
              CAST(s_click div n_click AS BIGINT),
           3, 'purchase', n_purchase,
              CAST(1000 * n_purchase div n_click AS BIGINT),
              CAST(1000 * n_purchase div n_view AS BIGINT),
              CAST(s_purchase div n_purchase AS BIGINT))
         AS (step_idx, step, n_users, conv_pm_prev, conv_pm_first, mean_s_from_view)"""))
      .orderBy("step_idx")
  }

  val etlFunnel: Q = (s, d) => funnelOf(t(s, d, "events"))

  /** T12: event-type TRANSITION matrix — the first-order Markov view of
    * the event stream (what follows what, per user): one window `lag`
    * over (user, time) — a single shuffle on the series key, exactly
    * etl_anomaly's scale shape — then a bounded |types|² group-by with
    * integer per-mille transition probabilities (row-normalized by the
    * `prev` marginal via a window sum over the KB-scale matrix). */
  def transitionsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob_pm",
        expr("CAST(1000 * n div sum(n) OVER (PARTITION BY prev) AS BIGINT)"))
      .select(col("prev"), col("next"), col("n"), col("prob_pm"))
      .orderBy("prev", "next")
  }

  val etlTransitions: Q = (s, d) => transitionsOf(t(s, d, "events"))

  /** T13: right-to-be-FORGOTTEN propagation — GDPR/CCPA tombstone
    * deletes applied across the raw table AND its derived store in one
    * report. The delete list is a tiny frame (user_id % 37 == 0 here; a
    * real one arrives as a compliance feed) anti-joined against each
    * store — Catalyst broadcasts it, so the purge is one scan per store
    * with no shuffle at 100 TB, and re-running it is idempotent. The
    * report carries integer content checksums (sum of surviving ids),
    * not just counts, so the gate proves WHICH rows survived. */
  def forgetOf(ev: DataFrame): DataFrame = {
    val dellist = ev.select("user_id").distinct()
      .filter(col("user_id") % 37 === 0)
    val keptEv = ev.join(broadcast(dellist), Seq("user_id"), "left_anti")
    val sessions = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val keptSess = sessions.join(broadcast(dellist), Seq("user_id"), "left_anti")
    val evRow = ev.agg(count(lit(1)).as("n_before")).crossJoin(
      keptEv.agg(count(lit(1)).as("n_kept"), sum("event_id").as("kept_id_sum")))
      .select(lit("events").as("store"), col("n_before"), col("n_kept"),
        (col("n_before") - col("n_kept")).as("n_purged"), col("kept_id_sum"))
    val sessRow = sessions.agg(count(lit(1)).as("n_before")).crossJoin(
      keptSess.agg(count(lit(1)).as("n_kept"), sum("user_id").as("kept_id_sum")))
      .select(lit("sessions").as("store"), col("n_before"), col("n_kept"),
        (col("n_before") - col("n_kept")).as("n_purged"), col("kept_id_sum"))
    evRow.unionByName(sessRow).orderBy("store")
  }

  val etlForget: Q = (s, d) => forgetOf(t(s, d, "events"))

  /** T14: Z-ORDER layout audit — multi-dimensional data clustering for
    * scan pruning (Delta/Iceberg OPTIMIZE ZORDER's shape): interleave the
    * bits of (day 0-30 → 5 bits, event-type index 0-4 → 3 bits) into a
    * Morton key, bucket rows into "files" by its top bits, and report
    * each file's per-dimension min/max envelope plus the 2-D span —
    * exactly the footer statistics a reader prunes on. A predicate on
    * EITHER dimension skips most z-ordered files, where a linear sort
    * only prunes its leading column (TransformsSpec pins z's mean span
    * strictly below the linear layout's). Pure integer bit arithmetic,
    * no shuffle until the 32-row rollup. */
  def zorderOf(ev: DataFrame): DataFrame = {
    val tix = (when(col("event_type") === "click", 0)
      .when(col("event_type") === "error", 1)
      .when(col("event_type") === "purchase", 2)
      .when(col("event_type") === "signup", 3)
      .otherwise(4)).cast("long")
    // Day-domain bound: 10 bits = 1024 days (~2.8 years) from the corpus
    // epoch. The original 5 bits aliased distinct days into one Morton key
    // for any corpus spanning >= 32 days, silently corrupting the per-file
    // min/max envelopes; on a <= 32-day corpus the widened encoding is
    // BIT-IDENTICAL (high day bits are zero), so the gate hashes are
    // unchanged while the layout now survives a multi-year date range.
    // Beyond 1024 days the same aliasing returns — a production layout
    // derives the width from the partition's date span at write time.
    val dayBits = 10
    val typeBits = 3
    val zExpr = (0 until dayBits).map(i =>
      s"(shiftleft((shiftright(day, $i) & 1), ${2 * i}))").mkString(" + ") +
      " + " + (0 until typeBits).map(i =>
      s"(shiftleft((shiftright(tix, $i) & 1), ${2 * i + 1}))").mkString(" + ")
    ev
      .withColumn("day", datediff(col("ts").cast("date"),
        lit(java.sql.Date.valueOf("2024-01-01"))).cast("long"))
      .withColumn("tix", tix)
      .withColumn("z", expr(zExpr))
      .withColumn("file_id", expr("shiftright(z, 5)"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("day").as("min_day"), max("day").as("max_day"),
        min("tix").as("min_tix"), max("tix").as("max_tix"))
      .withColumn("span",
        (col("max_day") - col("min_day") + 1) * (col("max_tix") - col("min_tix") + 1))
      .orderBy("file_id")
  }

  val etlZorder: Q = (s, d) => zorderOf(t(s, d, "events"))

  /** T15: GAP-based sessionizer (batch) — the other canonical session
    * definition (T1 groups a user's whole history; ST3 streams event-time
    * windows): a session breaks when the idle gap exceeds 4 h. One window
    * pass on the series key derives the break flags (lag) and session
    * ids (running sum of breaks — prefix sums stay inside the same
    * single partition-and-sort, so the whole derivation is ONE shuffle),
    * then a per-(user, session) group-agg. Integer seconds throughout. */
  def sessionsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 14400L,
          1L).otherwise(0L))
      .withColumn("sess_idx",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_idx")
      .agg(
        min("ts").as("start_ts"),
        max("ts").as("end_ts"),
        count(lit(1)).as("n_events"),
        r2(sum("value")).as("total_value"))
      .withColumn("duration_s",
        (unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts"))).cast("long"))
      .orderBy("user_id", "sess_idx")
      .limit(500)
  }

  val etlSessions: Q = (s, d) => sessionsOf(t(s, d, "events"))

  /** T16: CDC MERGE apply (upsert) — the warehouse-side half of change
    * data capture: a change feed of updates / deletes / inserts applied
    * to the base table in ONE full-outer equi-join on the natural key
    * (no row-at-a-time MERGE loop; at 100 TB both sides shuffle once on
    * the key, or the feed broadcasts when it is a day's delta). The
    * change feed here is derived deterministically from the base so the
    * oracle replays it: key%10==3 → price+1000 update, %10==7 → delete,
    * %10==1 → insert under key+10⁷. The readout aggregates the merged
    * table per status with integer key checksums — content proof, not
    * just counts. */
  /** The deterministic change feed derived from the base (key%10
    * residues → update/delete/insert) — shared by the one-shot apply
    * and the ST26 streamed store's batch split, so the oracle replays
    * it exactly. */
  def cdcChangesOf(base0: DataFrame): DataFrame = {
    val base = base0.select("o_orderkey", "o_orderstatus", "o_totalprice")
    // Insert keys must NEVER collide with base keys, or the full-outer
    // apply silently turns inserts into overwrites. The offset is derived
    // from the data — the smallest power of 10 above max(o_orderkey),
    // computed as 10^len(max as string) (string length, not log10: the
    // double log10 of a power of 10 can land a hair below the integer) —
    // instead of a hard-coded 10^7, which TPC-H o_orderkey (6M·SF)
    // overtakes at SF >= 2. One broadcast scalar row; exact in both
    // engines (10^len is double-exact far past any BIGINT key width).
    val off = base.agg(max("o_orderkey").as("mx"))
      .select(pow(lit(10.0), length(col("mx").cast("string")))
        .cast("long").as("ins_off"))
    base.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit("U").as("op"),
        (col("o_totalprice") + 1000.0).as("chg_price"))
      .unionByName(
        base.filter(col("o_orderkey") % 10 === 7)
          .select(col("o_orderkey"), lit("D").as("op"),
            lit(null).cast("double").as("chg_price")))
      .unionByName(
        base.filter(col("o_orderkey") % 10 === 1)
          .crossJoin(broadcast(off))
          .select((col("o_orderkey") + col("ins_off")).as("o_orderkey"),
            lit("I").as("op"), col("o_totalprice").as("chg_price")))
  }

  /** The apply half: one full-outer equi-join of base × (per-key latest)
    * changes + the per-status checksum readout — shared by the one-shot
    * key and the streamed store's readout. */
  def cdcApply(base0: DataFrame, changes: DataFrame): DataFrame = {
    val base = base0.select("o_orderkey", "o_orderstatus", "o_totalprice")
    base.join(changes, Seq("o_orderkey"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        col("o_orderkey"),
        when(col("op") === "I", "I")
          .when(col("op") === "U", "U")
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("op").isin("I", "U"), col("chg_price"))
          .otherwise(col("o_totalprice")).as("price"))
      .groupBy("status")
      .agg(
        count(lit(1)).as("n"),
        r2(sum("price")).as("sum_price"),
        sum("o_orderkey").as("key_sum"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("status")
  }

  def mergeCdcOf(base: DataFrame): DataFrame =
    cdcApply(base, cdcChangesOf(base))

  /** The CDC merge oracle over a FILTERED change feed — `changeFilter`
    * selects which change rows apply ("TRUE" = the full feed, the
    * one-shot/full-store gate; a batch-prefix predicate = the ST26 as-of
    * read). The derivation, apply join, and readout stay verbatim. */
  private[graft] def mergeCdcOracle(changeFilter: String): String =
    s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
           changes0 AS (
             SELECT o_orderkey, 'U' AS op, o_totalprice + 1000.0 AS chg_price
             FROM base WHERE o_orderkey % 10 = 3
             UNION ALL
             SELECT o_orderkey, 'D', NULL FROM base WHERE o_orderkey % 10 = 7
             UNION ALL
             SELECT o_orderkey + (SELECT CAST(power(10,
                      length(CAST(max(o_orderkey) AS VARCHAR))) AS BIGINT)
                    FROM base), 'I', o_totalprice
             FROM base WHERE o_orderkey % 10 = 1),
           changes AS (SELECT * FROM changes0 WHERE $changeFilter),
           merged AS (
             SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
                    CASE WHEN c.op = 'I' THEN 'I'
                         WHEN c.op = 'U' THEN 'U'
                         ELSE b.o_orderstatus END AS status,
                    CASE WHEN c.op IN ('I', 'U') THEN c.chg_price
                         ELSE b.o_totalprice END AS price
             FROM base b FULL OUTER JOIN changes c
               ON b.o_orderkey = c.o_orderkey
             WHERE coalesce(c.op, '') <> 'D')
         SELECT status, count(*) AS n, round(sum(price), 2) AS sum_price,
                CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM merged GROUP BY status ORDER BY status"""

  val etlMergeCdc: Q = (s, d) => mergeCdcOf(t(s, d, "orders"))

  val queries: Map[String, Q] = Map(
    "etl_sessions" -> etlSessions,
    "etl_merge_cdc" -> etlMergeCdc,
    "etl_funnel" -> etlFunnel,
    "etl_transitions" -> etlTransitions,
    "etl_forget" -> etlForget,
    "etl_zorder" -> etlZorder,
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
    "etl_sessions" ->
      """WITH lg AS (
           SELECT user_id, event_id, ts, value,
                  lag(ts, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
           FROM events),
           br AS (
           SELECT user_id, event_id, ts, value,
                  CASE WHEN prev_ts IS NULL
                            OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 14400
                       THEN 1 ELSE 0 END AS brk
           FROM lg),
           sx AS (
           SELECT user_id, ts, value,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess_idx
           FROM br)
         SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
                min(ts) AS start_ts, max(ts) AS end_ts,
                count(*) AS n_events, round(sum(value), 2) AS total_value,
                CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
                  AS duration_s
         FROM sx GROUP BY 1, 2 ORDER BY user_id, sess_idx LIMIT 500""",
    "etl_merge_cdc" -> mergeCdcOracle("TRUE"),
    "etl_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                    WHERE event_type = 'view' GROUP BY 1),
           c AS (SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts
                 FROM events e JOIN v ON e.user_id = v.user_id
                 WHERE e.event_type = 'click' AND e.ts >= v.v_ts
                 GROUP BY 1),
           p AS (SELECT e.user_id, min(e.ts) AS p_ts, min(c.v_ts) AS v_ts
                 FROM events e JOIN c ON e.user_id = c.user_id
                 WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
                 GROUP BY 1),
           va AS (SELECT count(*) AS n_view FROM v),
           ca AS (SELECT count(*) AS n_click,
                         sum(CAST(floor(epoch(c_ts)) - floor(epoch(v_ts)) AS BIGINT)) AS s_click
                  FROM c),
           pa AS (SELECT count(*) AS n_purchase,
                         sum(CAST(floor(epoch(p_ts)) - floor(epoch(v_ts)) AS BIGINT)) AS s_purchase
                  FROM p),
           allr AS (SELECT * FROM va CROSS JOIN ca CROSS JOIN pa)
         SELECT 1 AS step_idx, 'view' AS step, n_view AS n_users,
                CAST(1000 AS BIGINT) AS conv_pm_prev,
                CAST(1000 * n_view // n_view AS BIGINT) AS conv_pm_first,
                CAST(0 AS BIGINT) AS mean_s_from_view
         FROM allr
         UNION ALL
         SELECT 2, 'click', n_click,
                CAST(1000 * n_click // n_view AS BIGINT),
                CAST(1000 * n_click // n_view AS BIGINT),
                CAST(s_click // n_click AS BIGINT)
         FROM allr
         UNION ALL
         SELECT 3, 'purchase', n_purchase,
                CAST(1000 * n_purchase // n_click AS BIGINT),
                CAST(1000 * n_purchase // n_view AS BIGINT),
                CAST(s_purchase // n_purchase AS BIGINT)
         FROM allr
         ORDER BY step_idx""",
    "etl_transitions" ->
      """WITH lg AS (
           SELECT user_id, event_type,
                  lag(event_type, 1) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
           FROM events),
           m AS (SELECT prev, event_type AS next, count(*) AS n
                 FROM lg WHERE prev IS NOT NULL GROUP BY 1, 2)
         SELECT prev, next, n,
                CAST(1000 * n // sum(n) OVER (PARTITION BY prev) AS BIGINT) AS prob_pm
         FROM m ORDER BY prev, next""",
    "etl_forget" ->
      """WITH del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
           ke AS (SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM del)),
           sess AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
           ks AS (SELECT * FROM sess WHERE user_id NOT IN (SELECT user_id FROM del))
         SELECT 'events' AS store,
                (SELECT count(*) FROM events) AS n_before,
                (SELECT count(*) FROM ke) AS n_kept,
                (SELECT count(*) FROM events) - (SELECT count(*) FROM ke) AS n_purged,
                (SELECT CAST(sum(event_id) AS BIGINT) FROM ke) AS kept_id_sum
         UNION ALL
         SELECT 'sessions',
                (SELECT count(*) FROM sess),
                (SELECT count(*) FROM ks),
                (SELECT count(*) FROM sess) - (SELECT count(*) FROM ks),
                (SELECT CAST(sum(user_id) AS BIGINT) FROM ks)
         ORDER BY store""",
    "etl_zorder" ->
      """WITH q AS (
           SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                       WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                       ELSE 4 END AS BIGINT) AS tix
           FROM events),
           z AS (SELECT day, tix,
                        (((day >> 0) & 1) << 0) + (((day >> 1) & 1) << 2)
                        + (((day >> 2) & 1) << 4) + (((day >> 3) & 1) << 6)
                        + (((day >> 4) & 1) << 8) + (((day >> 5) & 1) << 10)
                        + (((day >> 6) & 1) << 12) + (((day >> 7) & 1) << 14)
                        + (((day >> 8) & 1) << 16) + (((day >> 9) & 1) << 18)
                        + (((tix >> 0) & 1) << 1) + (((tix >> 1) & 1) << 3)
                        + (((tix >> 2) & 1) << 5) AS zv
                 FROM q)
         SELECT zv >> 5 AS file_id, count(*) AS n,
                min(day) AS min_day, max(day) AS max_day,
                min(tix) AS min_tix, max(tix) AS max_tix,
                (max(day) - min(day) + 1) * (max(tix) - min(tix) + 1) AS span
         FROM z GROUP BY 1 ORDER BY file_id""",
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
