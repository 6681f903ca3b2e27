package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Common._

/** jx window clause (SURVEY.md §2.5). Upstream: jx_python/windows.py — a
  * window spec {name, value, aggregate, edges (partition), sort (order),
  * range {min,max}} evaluated with O(1)-slide aggregate objects. Spark's
  * `WindowExec` already implements sliding-frame aggregation with a single
  * sort per (partition, order) — all seven shapes below share the events
  * table's (user_id, ts) clustering, so at scale they cost one shuffle. */
object Windows {

  private val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** W1: partitioned running aggregate (unbounded preceding → current). */
  val winRunningSum: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("running",
        r2(sum("value").over(byUser.rowsBetween(Window.unboundedPreceding, 0))))
      .select("event_id", "user_id", "running")
      .orderBy("event_id")
      .limit(500)

  /** W2: sliding rows frame {min:-10, max:0} — trailing 11 rows. */
  val winSliding: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("sliding", r2(sum("value").over(byUser.rowsBetween(-10, 0))))
      .select("event_id", "user_id", "sliding")
      .orderBy("event_id")
      .limit(500)

  /** W2b: RANGE frame over event time — the trailing-hour aggregate.
    * rows-frames count a fixed number of rows; a RANGE frame bounds the
    * frame by the ORDER value itself (here epoch seconds, −3600..0), the
    * right semantics when events are irregularly spaced (time-decayed
    * metrics, rate limiting, rolling SLO windows). */
  val winRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    t(s, d, "events")
      .withColumn("hr_sum", r2(sum("value").over(w)))
      .withColumn("hr_n", count(lit(1)).over(w))
      .select("event_id", "event_type", "hr_sum", "hr_n")
      .orderBy("event_id")
      .limit(500)
  }

  /** W3: rank family per partition. */
  val winRank: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    t(s, d, "events")
      .select(
        col("event_id"), col("event_type"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .filter(col("rn") <= 20)
      .orderBy("event_type", "rn")
  }

  /** W3b: the distribution-rank family — ntile (equal-depth bucketing for
    * quantile assignment), percent_rank and cume_dist (normalized ranks —
    * percentile features without materializing the percentile). Same
    * per-partition parallelism as the rank family. */
  val winNtile: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    t(s, d, "events")
      .select(
        col("event_id"), col("event_type"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        r4(percent_rank().over(w)).as("pct_rank"),
        r4(cume_dist().over(w)).as("cdist"))
      .filter(col("rn") <= 20)
      .orderBy("event_type", "rn")
  }

  /** W4: first/last value in partition (full frame for last). */
  val winFirstLast: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("first_v",
        r2(first("value").over(byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
      .withColumn("last_v",
        r2(last("value").over(byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
      .select("event_id", "user_id", "first_v", "last_v")
      .orderBy("event_id")
      .limit(500)

  /** W5: lag/lead — previous-doc deltas (the log-sessionizer inter-event
    * gap, upstream shape in unittest_logs_to_sorted_table.py). */
  val winLag: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("prev_v", lag("value", 1).over(byUser))
      .withColumn("next_v", lead("value", 1).over(byUser))
      .withColumn("gap_s",
        (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser))).cast("long"))
      .select(col("event_id"), col("user_id"), r2(col("prev_v")).as("prev_v"),
        r2(col("next_v")).as("next_v"), col("gap_s"))
      .orderBy("event_id")
      .limit(500)

  /** W6: percentile over partition — an aggregate as a window function
    * (jx window {aggregate: percentile, edges: [...]}) — every row carries
    * its partition's interpolated p50/p90. One shuffle on event_type;
    * Spark ≥3.1 evaluates aggregate-as-window natively in WindowExec. */
  val winPercentile: Q = (s, d) => {
    val w = Window.partitionBy("event_type")
    t(s, d, "events")
      .select(
        col("event_id"), col("event_type"),
        r2(expr("percentile(value, 0.5)").over(w)).as("p50_type"),
        r2(expr("percentile(value, 0.9)").over(w)).as("p90_type"))
      .orderBy("event_id")
      .limit(500)
  }

  /** W7: top-k per group (slowest tests per suite, upstream shape). */
  val winTopk: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    t(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("event_type", "rn", "event_id", "value")
      .orderBy("event_type", "rn")
  }

  /** W10: exponential moving average, the truncated-kernel form. True EMA
    * is recursive (ema_i = αx_i + (1-α)ema_{i-1}) — inexpressible as a
    * frame aggregate and, done naively (exploding (1-α)^(-i) weights),
    * numerically divergent past a few hundred rows. The scale shape is the
    * K-term truncated kernel: ema_i = Σ_{k<K} (1-α)^k·x_{i-k} / Σ (1-α)^k
    * over the rows that exist — with α=0.25, K=12 the dropped tail weight
    * is 0.75^12 ≈ 3%%, and the whole thing is K lag() calls in ONE
    * WindowExec pass (no recursion, no state, O(K) per row). The weight
    * literals are computed once in Scala and embedded VERBATIM in both
    * engines ((3/4)^k is exactly representable in binary, and both sides
    * sum the K terms left-to-right), so the doubles match bit-for-bit
    * before the r4 round. */
  val winEma: Q = (s, d) => {
    val terms = (0 until EmaK).map { k =>
      val x = if (k == 0) col("value") else lag("value", k).over(byUser)
      (when(x.isNotNull, lit(EmaW(k)) * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(EmaW(k))).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    t(s, d, "events")
      .withColumn("ema", r4(num / den))
      .select("event_id", "user_id", "ema")
      .orderBy("event_id")
      .limit(500)
  }

  /** Truncated-EMA kernel: α=0.25 ⇒ decay 0.75, K=12 taps. The weights are
    * shared with the oracle SQL so both engines multiply identical double
    * literals ((3/4)^k = 3^k / 4^k — exact in binary for k ≤ 33). */
  private val EmaK = 12
  private val EmaW: IndexedSeq[Double] =
    (0 until EmaK).map(k => math.pow(0.75, k))

  /** W12: TRUE recursive EMA (r17 — closes the W10 row's documented gap):
    * ema_0 = x_0, ema_i = (1-α)·ema_{i-1} + α·x_i with α = 1/4, the
    * unbounded recursion the truncated kernel approximates to ~3%. A
    * frame aggregate cannot express it and the rescaled-prefix-sum trick
    * overflows ((4/3)^i diverges past ~2.5k rows), so this is the ONE
    * legitimately sequential operator in the window family: repartition
    * on the series key, sort within partitions by (key, ts, id), then a
    * single mapPartitions pass carrying O(1) state per series — the
    * documented last-resort pattern (multimodal codec's), justified here
    * because the recurrence is genuinely order-dependent. At 100 TB: one
    * shuffle on the series key, one linear pass; skew bound = one
    * series' history per task, the floor ANY order-dependent recurrence
    * has. Exactness: both engines run the identical IEEE fold
    * acc := 0.75·acc + 0.25·x in the identical (ts, id) order — the
    * oracle's list_reduce over the per-row prefix list replays it
    * bit-for-bit before the r4 round. */
  val winEmaExact: Q = (s, d) => {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    // series key = user_id, the same key every other win_* uses (and the
    // key whose per-series history stays bounded as the corpus grows —
    // which also keeps the oracle's O(len²) prefix-list replay tractable
    // at any gate SF)
    val in = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
    val schema = StructType(in.schema.fields :+ StructField("ema", DoubleType))
    in.mapPartitions { it =>
        var key = Long.MinValue
        var acc = 0.0
        it.map { r =>
          val k = r.getLong(1)
          val x = r.getDouble(3)
          acc = if (k != key) { key = k; x } else 0.75 * acc + 0.25 * x
          Row(r.get(0), r.get(1), r.get(2), r.get(3), acc)
        }
      }(Encoders.row(schema))
      .select(col("event_id"), col("user_id"),
        r2(col("value")).as("value"), r4(col("ema")).as("ema"))
      .orderBy("event_id")
      .limit(500)
  }

  /** W9: percent_rank + cume_dist — the normalized rank pair (identical
    * definitions in both engines: (rank-1)/(n-1) and rows≤current/n). */
  val winPctRank: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    t(s, d, "events")
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        r4(percent_rank().over(w)).as("pct_rank"),
        r4(cume_dist().over(w)).as("cume"))
      .orderBy("event_id")
      .limit(500)
  }

  /** W10: nth_value — the positional frame accessor completing the
    * first/last/lag family (r16): the 3rd-smallest value per series, as
    * of each row (running frame), null while the frame is shorter. One
    * window pass on the series key. */
  val winNthValue: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"),
        r2(nth_value(col("value"), 3).over(w)).as("third_smallest"))
      .orderBy("event_id")
      .limit(500)
  }

  val queries: Map[String, Q] = Map(
    "win_ema" -> winEma,
    "win_ema_exact" -> winEmaExact,
    "win_pct_rank" -> winPctRank,
    "win_nth_value" -> winNthValue,
    "win_running_sum" -> winRunningSum,
    "win_sliding" -> winSliding,
    "win_range_frame" -> winRangeFrame,
    "win_rank" -> winRank,
    "win_ntile" -> winNtile,
    "win_first_last" -> winFirstLast,
    "win_lag" -> winLag,
    "win_percentile" -> winPercentile,
    "win_topk" -> winTopk)

  private val over = "OVER (PARTITION BY user_id ORDER BY ts, event_id"

  /** win_ema oracle: assembled from the SAME EmaW literals the Spark plan
    * multiplies (Double.toString round-trips exactly), K terms summed in
    * the same left-to-right order. */
  private val emaOracle: String = {
    def lagK(k: Int) =
      if (k == 0) "value" else s"lag(value, $k) OVER w"
    val num = (0 until EmaK).map { k =>
      s"(CASE WHEN ${lagK(k)} IS NULL THEN 0.0 ELSE ${EmaW(k)} * ${lagK(k)} END)"
    }.mkString(" + ")
    val den = (0 until EmaK).map { k =>
      s"(CASE WHEN ${lagK(k)} IS NULL THEN 0.0 ELSE ${EmaW(k)} END)"
    }.mkString(" + ")
    s"""SELECT event_id, user_id, round(($num) / ($den), 4) AS ema
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id LIMIT 500"""
  }

  val oracle: Map[String, String] = Map(
    "win_ema" -> emaOracle,
    // the exact recursion replayed as list_reduce over each row's prefix
    // list (same (ts, id) order, same fold, init = first element = x_0);
    // O(Σ len²) is fine at the gate SF — the ENGINE side stays linear
    "win_ema_exact" ->
      """SELECT event_id, user_id, round(value, 2) AS value,
                round(list_reduce(pre, (a, x) -> 0.75 * a + 0.25 * x), 4) AS ema
         FROM (SELECT event_id, user_id, value,
                      list(value) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
               FROM events)
         ORDER BY event_id LIMIT 500""",
    "win_nth_value" ->
      """SELECT event_id, event_type, round(value, 2) AS value,
                round(nth_value(value, 3) OVER (PARTITION BY event_type
                        ORDER BY value, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      2) AS third_smallest
         FROM events ORDER BY event_id LIMIT 500""",
    "win_pct_rank" ->
      """SELECT event_id, event_type, round(value, 2) AS value,
                round(percent_rank() OVER (PARTITION BY event_type
                        ORDER BY value, event_id), 4) AS pct_rank,
                round(cume_dist() OVER (PARTITION BY event_type
                        ORDER BY value, event_id), 4) AS cume
         FROM events ORDER BY event_id LIMIT 500""",
    "win_running_sum" ->
      s"""SELECT event_id, user_id,
                 round(sum(value) $over ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
          FROM events ORDER BY event_id LIMIT 500""",
    "win_sliding" ->
      s"""SELECT event_id, user_id,
                 round(sum(value) $over ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 2) AS sliding
          FROM events ORDER BY event_id LIMIT 500""",
    "win_range_frame" ->
      """SELECT event_id, event_type, round(hr_sum, 2) AS hr_sum, hr_n FROM (
           SELECT event_id, event_type,
                  sum(value) OVER w AS hr_sum,
                  count(*) OVER w AS hr_n
           FROM events
           WINDOW w AS (PARTITION BY event_type
                        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
         ORDER BY event_id LIMIT 500""",
    "win_rank" ->
      """SELECT event_id, event_type, rn, rk, drk
         FROM (SELECT event_id, event_type,
                      CAST(row_number() OVER w AS INT) AS rn,
                      CAST(rank() OVER w AS INT) AS rk,
                      CAST(dense_rank() OVER w AS INT) AS drk
               FROM events
               WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC))
         WHERE rn <= 20 ORDER BY event_type, rn""",
    "win_ntile" ->
      """SELECT event_id, event_type, rn, quartile, pct_rank, cdist
         FROM (SELECT event_id, event_type,
                      CAST(row_number() OVER w AS INT) AS rn,
                      CAST(ntile(4) OVER w AS INT) AS quartile,
                      round(percent_rank() OVER w, 4) AS pct_rank,
                      round(cume_dist() OVER w, 4) AS cdist
               FROM events
               WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC))
         WHERE rn <= 20 ORDER BY event_type, rn""",
    "win_first_last" ->
      s"""SELECT event_id, user_id,
                 round(first_value(value) $over ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS first_v,
                 round(last_value(value) $over ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_v
          FROM events ORDER BY event_id LIMIT 500""",
    "win_lag" ->
      s"""SELECT event_id, user_id,
                 round(lag(value, 1) $over), 2) AS prev_v,
                 round(lead(value, 1) $over), 2) AS next_v,
                 CAST(floor(epoch(ts)) - floor(epoch(lag(ts, 1) $over))) AS BIGINT) AS gap_s
          FROM events ORDER BY event_id LIMIT 500""",
    "win_percentile" ->
      """SELECT event_id, event_type,
                round(quantile_cont(value, 0.5) OVER (PARTITION BY event_type), 2) AS p50_type,
                round(quantile_cont(value, 0.9) OVER (PARTITION BY event_type), 2) AS p90_type
         FROM events ORDER BY event_id LIMIT 500""",
    "win_topk" ->
      """SELECT event_type, rn, event_id, value
         FROM (SELECT event_type, event_id, value,
                      CAST(row_number() OVER (PARTITION BY event_type
                                              ORDER BY value DESC, event_id ASC) AS INT) AS rn
               FROM events)
         WHERE rn <= 3 ORDER BY event_type, rn""")
}
