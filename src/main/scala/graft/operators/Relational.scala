package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Common._

/** Scans, sorts, set ops, dedup, and the full join surface (SURVEY.md §2.1,
  * §2.3, §2.6).
  *
  * The reference (klahnakoski/TestLog-ETL) has no general join operator — it
  * denormalizes at ETL time (upstream: activedata_etl/transforms/
  * pulse_block_to_es.py copies build metadata into every test doc) and
  * enriches via in-memory lookup maps (upstream: activedata_etl/imports/
  * buildbot.py). Those two patterns ARE joins executed eagerly; here they are
  * declared lazily so Catalyst plans them (broadcast for small dims, SMJ/SHJ
  * for fact-fact, AQE skew handling at scale — SURVEY.md §2.3, §4).
  *
  * Scale notes (100 TB): dimension tables are broadcast explicitly; fact-fact
  * joins shuffle on their equi-keys only; every query aggregates or limits
  * before returning, so nothing materializes a full scan on the driver.
  */
object Relational {

  /** S2: plain columnar scan; Catalyst pushes the aggregate into a partial
    * hash agg over the vectorized parquet reader. */
  val scanParquet: Q = (s, d) =>
    t(s, d, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      sum("l_orderkey").as("sum_okey"),
      r2(sum("l_quantity")).as("sum_qty"))

  /** O1: multi-key sort, mixed direction. TakeOrdered at the physical layer
    * (sort+limit never shuffles a full sort at scale). */
  val sortMulti: Q = (s, d) =>
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy(asc("l_returnflag"), desc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(100)

  /** O2: global top-k — TakeOrderedAndProject, no global sort. */
  val sortLimit: Q = (s, d) =>
    t(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** O3: multi-bucket union (reference: multi-day ES index alias reads,
    * upstream sinks/split.py). unionByName is resilient to column order. */
  val setUnion: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val a = li.filter(col("l_returnflag") === "A").select("l_returnflag", "l_quantity")
    val b = li.filter(col("l_returnflag") === "R").select("l_returnflag", "l_quantity")
    a.unionByName(b)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), r2(sum("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** O3b: schema-accretion union — the reference's document model lets
    * heterogeneous docs share a table (ES index templates merge new
    * leaves; missing properties read as Null — upstream mo_dots /
    * jx schema expansion). Spark-native form:
    * `unionByName(allowMissingColumns = true)` aligns by name and fills
    * absent columns with null — no manual schema reconciliation. */
  val setUnionByName: Q = (s, d) => {
    val ev = t(s, d, "events")
    val a = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "value")
    val b = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "props")
    a.unionByName(b, allowMissingColumns = true)
      .agg(count(lit(1)).as("n"), count("value").as("n_value"),
        count("props").as("n_props"),
        r2(sum("value")).as("sum_value"))
  }

  /** O4: set intersection (distinct semantics, like SQL INTERSECT). */
  val setIntersect: Q = (s, d) => {
    val li = t(s, d, "lineitem").select("l_orderkey")
    val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"))
    li.intersect(o).orderBy("l_orderkey").limit(100)
  }

  /** O4: set difference — orders that never shipped a line item. */
  val setExcept: Q = (s, d) => {
    val o = t(s, d, "orders").select("o_orderkey")
    val li = t(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"))
    o.except(li).orderBy("o_orderkey").limit(100)
  }

  /** O5: exact dedup with a deterministic winner (reference: idempotent
    * re-ETL overwrites by etl key — upstream etl.py). row_number over a
    * total per-key order, not dropDuplicates, so the survivor is stable
    * across partitionings and matches the oracle. */
  val dedupExact: Q = (s, d) => {
    // (l_orderkey, l_linenumber) is NOT unique in this data — the order
    // must be total for a deterministic winner (verified: adding quantity
    // and price makes it unique at every SF).
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_quantity", "l_extendedprice")
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("l_orderkey")
      .limit(200)
  }

  /** O6: reproducible hash-mod sampling — the train/eval-split and
    * down-sampling primitive for data pipelines. `df.sample` is
    * seed-stable only within one engine and shifts when partitioning
    * changes; hashing the row's natural key (md5, like the dedup
    * family) gives a sample that is stable across runs, engines, and
    * repartitioning — a row's split assignment never changes, which is
    * what training reproducibility needs. 10% slice = hash mod 100 < 10;
    * evaluated entirely in the scan's codegen stage, no shuffle added. */
  val sampleHash: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("hs", expr(
        "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"))
      .filter(col("hs") < 10)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"), r2(avg("value")).as("avg_value"))
      .orderBy("event_type")

  /** O6b: stratified sampling with exact per-group quotas — the
    * training-mix primitive `sample_hash` can't express: "exactly k docs
    * per source/language/class", not a fraction. Rows rank by the same
    * md5 key-hash (engine-stable pseudorandom order, reproducible across
    * runs/partitionings), and each group keeps its first k. One shuffle
    * on the stratum key; the per-group sort is bounded by stratum size.
    * For billion-row strata the refinement is a two-phase threshold (rank
    * only rows whose hash clears a sketched k-th-quantile estimate) —
    * same output, no full per-group sort; not needed at this row count
    * and the window form is what the oracle replays exactly. */
  val sampleStratified: Q = (s, d) => {
    val k = 50
    val w = Window.partitionBy("event_type").orderBy("hs", "event_id")
    t(s, d, "events")
      .withColumn("hs", expr(
        "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"),
        r2(sum("value")).as("sum_value"),
        r2(avg("value")).as("avg_value"))
      .orderBy("event_type")
  }

  /** O6c: WEIGHTED sampling without replacement (Efraimidis–Spirakis
    * exponential race) — the training-mix primitive the uniform samplers
    * can't express: "k rows, probability proportional to weight" (quality
    * score, document length, source priority). Each row draws a
    * deterministic md5-uniform u ∈ (0,1] and its exponential arrival time
    * −ln(u)/w; the k SMALLEST arrivals are the sample — one in-row
    * expression per row plus a top-k (TakeOrdered; per-partition heaps,
    * never a global sort). Reproducible across runs and repartitionings
    * like the other md5-keyed samplers. The driver row hash-gates the
    * exact selected id set; the heavier-rows-oversampled property is
    * SampleSpec's assertion. */
  val sampleWeighted: Q = (s, d) => {
    val k = 100
    t(s, d, "events")
      .withColumn("u",
        (expr("CAST(conv(substr(md5(concat('wsamp:', CAST(event_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .cast("double") + 1.0) / lit(1.152921504606846976e18))
      .withColumn("w", greatest(col("value"), lit(0.001)))
      .withColumn("pri", -log(col("u")) / col("w"))
      .orderBy(asc("pri"), asc("event_id"))
      .limit(k)
      .select(col("event_id"), col("event_type"), r2(col("value")).as("value"))
      .orderBy("event_id")
  }

  /** J1: broadcast equi-join — the reference's denormalize/enrich pattern
    * (small dim copied to every fact row). TPC-H Q3 shape. At 100 TB the
    * dims here are KB-MB; broadcast avoids shuffling the fact table. */
  val joinBroadcast: Q = (s, d) => {
    val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, d, "orders")
    val li = t(s, d, "lineitem")
    li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** J2: fact-fact equi-join, explicitly sort-merge (hint) — the shape AQE
    * would pick anyway once both sides outgrow the broadcast threshold. */
  val joinSortmerge: Q = (s, d) => {
    val ord = t(s, d, "orders").hint("merge")
    val li = t(s, d, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), r2(sum("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** J3: outer join with a join-side predicate (non-matching rows null). */
  val joinOuter: Q = (s, d) => {
    val ord = t(s, d, "orders")
    val cust = t(s, d, "customer")
    ord.join(cust,
        ord("o_custkey") === cust("c_custkey") && cust("c_acctbal") > 5000.0,
        "left")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("c_custkey")).as("n_matched"),
        r2(sum("c_acctbal")).as("sum_bal"))
      .orderBy("o_orderstatus")
  }

  /** J4: left semi — EXISTS without duplicating the right side. */
  val joinSemi: Q = (s, d) => {
    val cust = t(s, d, "customer")
    val big = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
      .limit(100)
  }

  /** J5: left anti — NOT EXISTS (reference shape: dead-letter routing of
    * keys that produced no output, upstream etl.py). */
  val joinAnti: Q = (s, d) => {
    val cust = t(s, d, "customer")
    val big = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
      .limit(100)
  }

  /** J6: range (band) join against a literal bucket domain — the interval
    * overlap shape. The bucket side is tiny → broadcast nested loop, which
    * is the right physical plan; at scale add a band equi-key (floor(value/
    * width)) to convert to an equi-join if the ranges align. */
  val joinRange: Q = (s, d) => {
    import s.implicits._
    val buckets = Seq(
      (0L, 0.0, 50.0), (1L, 50.0, 100.0), (2L, 100.0, 150.0),
      (3L, 150.0, 200.0), (4L, 200.0, 1e9))
      .toDF("bucket_id", "lo", "hi")
    val ev = t(s, d, "events")
    ev.join(broadcast(buckets), ev("value") >= buckets("lo") && ev("value") < buckets("hi"))
      .groupBy("bucket_id")
      .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
      .orderBy("bucket_id")
  }

  /** J6 at scale: the banded interval join — when BOTH sides are large,
    * a theta join (point ∈ [lo, hi)) plans as a nested loop and dies at
    * 100 TB. The standard conversion: quantize the axis into fixed-width
    * bands, explode each interval into every band it overlaps, band the
    * point side (one band per point), equi-join on the band key, and
    * re-check the exact predicate as the join residual. Each (point,
    * interval) match surfaces exactly once — the point has ONE band — so
    * no dedup pass is needed. Cost: equi-join on a key with bounded
    * per-band population + (interval_width / band_width) index rows per
    * interval; pick `width` near the median interval length. */
  def bandedRangeJoin(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Double): DataFrame = {
    val bp = points.withColumn("__band", floor(col(pCol) / width).cast("long"))
    val bi = intervals.withColumn("__band", explode(sequence(
      floor(col(loCol) / width).cast("long"),
      floor(col(hiCol) / width).cast("long"))))
    bp.join(bi, Seq("__band"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__band")
  }

  /** Driver key for [[bandedRangeJoin]]: each user's [min, max) value
    * range as the interval side, every event as the point side — a
    * genuinely big-big interval join (no broadcastable side at scale). */
  /** Per-interval COUNT/SUM over a banded axis WITHOUT materializing the
    * candidate join (r19, guide §2.3 "aggregate before you shuffle" + the
    * §8 decide-on-small-rows lesson). The banded equi-join form emits one
    * row per (point, covering interval) candidate — on this data that is
    * ~148M rows of which 97% are TRUE matches (census: the per-user
    * [min, max) intervals cover most of the value axis), so no pre-filter
    * (Bloom, semi-join) can reduce it: the JOIN OUTPUT is the cost. But
    * the query only needs per-interval count/sum, and those decompose by
    * band: every band strictly inside [lo, hi) contributes its
    * PRE-AGGREGATED (count, sum) — one row per (interval, inner band),
    * |intervals| × bands_per_interval rows — and only the two BOUNDARY
    * bands (the ones containing lo and hi, where the exact predicate can
    * cut a band in half) join row-level points, Σ_band points(band) ×
    * boundary_intervals(band) rows. At width 5 on sf0.1 that is ~0.9M
    * inner rows + ~2.7M edge rows vs 148M candidates (~40×
    * fewer); the reduction grows with match density, which is what kills
    * the candidate form at 100 TB. Output is identical: the same addend
    * multiset per interval, regrouped (counts exact integers; the double
    * sum is r2-rounded and already survives a cross-engine reordering —
    * the DuckDB oracle sums in its own order). Width trades edge volume
    * (∝ w) against inner volume (∝ 1/w); 5.0 sits near the knee
    * w* = range/√(2·n_points) for this axis and is output-invariant. */
  private[graft] def bandedRangeAggByUid(ev: org.apache.spark.sql.DataFrame,
      width: Double): org.apache.spark.sql.DataFrame = {
    val w = width
    val iv = ev.groupBy(col("user_id").as("uid"))
      .agg(min("value").as("lo"), max("value").as("hi"))
      .withColumn("lo_b", floor(col("lo") / w).cast("long"))
      .withColumn("hi_b", floor(col("hi") / w).cast("long"))
    val pts = ev.select(col("value"),
      floor(col("value") / w).cast("long").as("band"))
    // tiny: one row per populated band
    val bandAgg = pts.groupBy("band")
      .agg(count(lit(1)).as("bn"), sum("value").as("bs"))
    // full inner bands: pre-aggregated contribution, no point rows touched
    val inner = iv
      .withColumn("band", explode(when(col("hi_b") >= col("lo_b") + 2,
        sequence(col("lo_b") + 1, col("hi_b") - 1))
        .otherwise(array().cast("array<long>"))))
      .join(bandAgg, Seq("band"))
      .groupBy("uid")
      .agg(sum("bn").as("in_n"), sum("bs").as("in_s"))
    // boundary bands: exact predicate over just those bands' points
    val edge = iv
      .select(col("uid"), col("lo"), col("hi"),
        explode(array_distinct(array(col("lo_b"), col("hi_b")))).as("band"))
      .join(pts, Seq("band"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("uid")
      .agg(count(lit(1)).as("e_n"), sum("value").as("e_s"))
    inner.join(edge, Seq("uid"), "full_outer")
      .select(col("uid"),
        (coalesce(col("in_n"), lit(0L)) + coalesce(col("e_n"), lit(0L))).as("n"),
        (coalesce(col("in_s"), lit(0.0)) + coalesce(col("e_s"), lit(0.0))).as("sum_v_raw"))
      .filter(col("n") > 0)
  }

  val joinRangeBanded: Q = (s, d) => {
    bandedRangeAggByUid(t(s, d, "events"), 5.0)
      .select(col("uid"), col("n"), r2(col("sum_v_raw")).as("sum_v"))
      .orderBy("uid")
  }

  /** J6c: BAND-WIDTH TUNING census for the banded interval join (r17 —
    * the one standing output-bound key's knob, measured): per width ∈
    * {5, 25, 100, 400} on the value axis, the index replication
    * (Σ bands per interval) and the exact candidate-pair count the band
    * equi-join would produce — computed WITHOUT materializing the join:
    * n_cand = Σ_band points(band) · intervals_covering(band), a product
    * of two KB-scale band-count frames. Narrow bands replicate intervals
    * more but admit fewer false candidates; the knee of n_cand vs
    * replication is where a 100 TB run sets the width. The matched count
    * (width-INVARIANT — every true pair survives any banding; pinned
    * per-width in RelationalTuningSpec) is computed once via the
    * production width-25 join, giving each knob an exact per-mille
    * precision. */
  val joinRangeTuning: Q = (s, d) => {
    val ev = t(s, d, "events").select(col("event_id"), col("value"))
    val iv = t(s, d, "events").groupBy(col("user_id").as("uid"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    // exact match count WITHOUT the 148M-row candidate join: the
    // width-invariant total is the sum of [[bandedRangeAggByUid]]'s exact
    // per-interval counts (same inner-band + boundary-band decomposition
    // as the production key — counts are exact integers either way)
    val matched = bandedRangeAggByUid(t(s, d, "events"), 5.0)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_matched"))
    val nIv = iv.agg(count(lit(1)).as("n_intervals"))
    val rows = Seq(5L, 25L, 100L, 400L).map { w =>
      val np = ev
        .withColumn("band", floor(col("value") / w.toDouble))
        .groupBy("band").agg(count(lit(1)).as("np"))
      val ni = iv
        .withColumn("band", explode(sequence(
          floor(col("lo") / w.toDouble).cast("long"),
          floor(col("hi") / w.toDouble).cast("long"))))
        .groupBy("band").agg(count(lit(1)).as("ni"))
      np.join(ni, Seq("band"))
        .agg(sum(col("np") * col("ni")).as("n_cand"))
        .crossJoin(ni.agg(sum("ni").as("n_index_rows")))
        .select(lit(w).as("width"), col("n_index_rows"), col("n_cand"))
    }
    rows.reduce(_.unionByName(_))
      .crossJoin(broadcast(nIv))
      .crossJoin(broadcast(matched))
      .withColumn("repl_pm",
        expr("CAST(1000 * n_index_rows div n_intervals AS BIGINT)"))
      .withColumn("precision_pm",
        expr("CAST(1000 * n_matched div n_cand AS BIGINT)"))
      .select("width", "n_intervals", "n_index_rows", "n_cand",
        "n_matched", "repl_pm", "precision_pm")
      .orderBy("width")
  }

  /** J11: interval-interval OVERLAP join — UNKEYED: every user session
    * (per-(user, type) [min ts, max ts]) against every maintenance
    * window it overlaps in TIME, with no shared key to equi-join on.
    * The naive form is a cartesian theta-join; the scale form BANDS both
    * sides into day quanta (an interval explodes to the days it covers —
    * bounded by its duration), equi-joins on the band, applies the exact
    * overlap residual (a_start ≤ w_end ∧ w_start ≤ a_end), and dedupes
    * multi-band sightings. Work is Σ interval-days, never |A|·|B|; skew
    * = a long interval, which AQE splits like any hot key. Windows are a
    * deterministic 60×4h grid both engines construct identically;
    * overlap seconds floor each epoch before differencing (the J7b
    * truncation rule). */
  val joinInterval: Q = (s, d) => {
    val sess = t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(min("ts").as("a_start"), max("ts").as("a_end"))
      .withColumn("band", expr(
        "explode(sequence(unix_timestamp(a_start) div 86400, " +
          "unix_timestamp(a_end) div 86400))"))
    val wins = s.range(60).select(
        col("id").as("win_id"),
        expr("timestampadd(HOUR, CAST(id * 12 AS INT), " +
          "timestamp'2024-01-01 00:00:00')").as("w_start"),
        expr("timestampadd(HOUR, CAST(id * 12 + 4 AS INT), " +
          "timestamp'2024-01-01 00:00:00')").as("w_end"))
      .withColumn("band", expr(
        "explode(sequence(unix_timestamp(w_start) div 86400, " +
          "unix_timestamp(w_end) div 86400))"))
    sess.join(wins, Seq("band"))
      .filter(col("a_start") <= col("w_end") && col("w_start") <= col("a_end"))
      .select("user_id", "event_type", "win_id", "a_start", "w_start",
        "a_end", "w_end")
      .distinct()
      .select(col("user_id"), col("event_type"), col("win_id"),
        (expr("unix_timestamp(least(a_end, w_end))") -
          expr("unix_timestamp(greatest(a_start, w_start))")).as("overlap_s"))
      .orderBy("user_id", "event_type", "win_id")
      .limit(500)
  }

  /** J7: as-of join — for each purchase, the latest signup at-or-before it
    * for the same user (reference shape: revision enrichment = latest build
    * ≤ test timestamp, upstream activedata_etl/imports/repos/).
    *
    * NOT a join at all: union both event kinds into one stream and take a
    * per-user running max of signup timestamps (ROWS unbounded-preceding →
    * current, ordered by (ts, kind) with signups sorting before purchases
    * at equal ts so `s_ts <= p_ts` includes ties). One shuffle on user_id,
    * one pass per row — work is LINEAR in a user's history. The previous
    * formulation (theta-join every purchase to ALL earlier signups, then
    * row_number → rn=1) materialized a per-user quadratic pair set before
    * the window pruned it; a skewed user with 10⁵ events would emit ~10¹⁰
    * intermediate rows at 100 TB. PlanAuditSpec pins the join-free shape. */
  val joinAsof: Q = (s, d) => {
    val ev = t(s, d, "events")
    val both = ev.filter(col("event_type").isin("purchase", "signup"))
      .select(
        when(col("event_type") === "purchase", col("event_id")).as("p_id"),
        col("user_id"), col("ts"),
        (col("event_type") === "purchase").cast("int").as("kind"))
    val w = Window.partitionBy("user_id").orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    both
      .withColumn("s_ts", max(when(col("kind") === 0, col("ts"))).over(w))
      .filter(col("kind") === 1)
      .select(col("p_id"), col("user_id"), col("ts").as("p_ts"), col("s_ts"))
      .orderBy("p_id")
      .limit(300)
  }

  /** J7b: as-of join WITH TOLERANCE (pandas merge_asof's `tolerance` /
    * kdb wj — the production form: a signup attributed to a purchase a
    * YEAR later is noise, not attribution). Same join-free union +
    * running-max plan as J7, then the match is kept only when the gap is
    * within the bound (24h here) — the tolerance is a post-filter on the
    * already-matched column, so the plan shape (one window over the
    * union, no Join node) is unchanged at any scale. Unmatched and
    * out-of-tolerance purchases both surface with a NULL match and a
    * NULL gap (left-join semantics, the audit-friendly form). */
  val joinAsofTol: Q = (s, d) => {
    val ev = t(s, d, "events")
    val both = ev.filter(col("event_type").isin("purchase", "signup"))
      .select(
        when(col("event_type") === "purchase", col("event_id")).as("p_id"),
        col("user_id"), col("ts"),
        (col("event_type") === "purchase").cast("int").as("kind"))
    val w = Window.partitionBy("user_id").orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolS = 86400L
    both
      .withColumn("s_ts", max(when(col("kind") === 0, col("ts"))).over(w))
      .filter(col("kind") === 1)
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(col("s_ts")))
      .select(col("p_id"), col("user_id"), col("ts").as("p_ts"),
        when(col("gap_s") <= tolS, col("s_ts")).as("s_ts"),
        when(col("gap_s") <= tolS, col("gap_s")).as("gap_s"))
      .orderBy("p_id")
      .limit(300)
  }

  /** J8: cross join (the dense-domain primitive under jx edges, §2.4). */
  val joinCross: Q = (s, d) => {
    val r = t(s, d, "region").select("r_name")
    val flags = t(s, d, "lineitem").select(col("l_returnflag").as("flag")).distinct()
    r.crossJoin(flags).orderBy("r_name", "flag")
  }

  /** J10: approximate-string (edit-distance) join — entity matching over
    * dirty text keys without the O(n·m) all-pairs levenshtein. Two scale
    * moves, both of which matter more as data grows:
    *  1. DEDUPE BEFORE VERIFY: candidates generate over DISTINCT strings
    *     (vocabulary-sized — orders of magnitude below row count on any
    *     real key column), never over rows.
    *  2. PIGEONHOLE SEGMENT BLOCKING: each string splits into 3 segments;
    *     two equal-length strings within ≤2 substitutions must agree on
    *     at least one (segment index, segment text) pair — so candidates
    *     come from an equi-join on the segment key, and the exact
    *     levenshtein runs only inside blocks. (Same banding argument as
    *     the SimHash family; completeness is for substitution edits —
    *     indel pairs of different lengths are out of contract and the
    *     oracle replays the identical blocking.)
    * The probe side is a deterministic 1-char corruption of each distinct
    * name (position = name_id % length), so both engines build identical
    * inputs and every probe has at least its own origin as a match. */
  val joinFuzzy: Q = (s, d) => {
    val names = t(s, d, "part")
      .groupBy(col("p_name").as("name"))
      .agg(min("p_partkey").as("name_id"))
    val probe = names.select(col("name_id").as("qid"),
      expr("""concat(substr(name, 1, CAST(name_id % length(name) AS INT)),
                     'z',
                     substr(name, CAST(name_id % length(name) AS INT) + 2))""")
        .as("qname"))
    def segments(df: DataFrame, nameCol: String, idCol: String): DataFrame =
      df.select(col(idCol), col(nameCol), explode(expr(
        s"""transform(sequence(0, 2),
              i -> struct(i AS i, length($nameCol) AS l,
                          substr($nameCol,
                                 CAST((i * length($nameCol)) DIV 3 AS INT) + 1,
                                 CAST(((i + 1) * length($nameCol)) DIV 3
                                      - (i * length($nameCol)) DIV 3 AS INT)) AS seg))"""))
        .as("s"))
        .select(col(idCol), col(nameCol),
          col("s.i").as("i"), col("s.l").as("l"), col("s.seg").as("seg"))
    val cand = segments(probe, "qname", "qid")
      .join(segments(names, "name", "name_id"), Seq("i", "l", "seg"))
      .select("qid", "qname", "name_id", "name")
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("qname"), col("name")).cast("long"))
      .filter(col("dist") <= 2)
      .groupBy("qid")
      .agg(count(lit(1)).as("n_matches"),
        min(struct(col("dist"), col("name_id"))).as("b"))
      .select(col("qid"), col("n_matches"),
        col("b.dist").as("min_dist"), col("b.name_id").as("best_id"))
      .orderBy("qid")
      .limit(300)
  }

  val queries: Map[String, Q] = Map(
    "join_fuzzy" -> joinFuzzy,
    "scan_parquet" -> scanParquet,
    "sort_multi" -> sortMulti,
    "sort_limit" -> sortLimit,
    "set_union" -> setUnion,
    "set_union_byname" -> setUnionByName,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "dedup_exact" -> dedupExact,
    "sample_hash" -> sampleHash,
    "sample_stratified" -> sampleStratified,
    "sample_weighted" -> sampleWeighted,
    "join_broadcast" -> joinBroadcast,
    "join_sortmerge" -> joinSortmerge,
    "join_outer" -> joinOuter,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_range" -> joinRange,
    "join_range_banded" -> joinRangeBanded,
    "join_range_tuning" -> joinRangeTuning,
    "join_asof" -> joinAsof,
    "join_asof_tol" -> joinAsofTol,
    "join_interval" -> joinInterval,
    "join_cross" -> joinCross)

  val oracle: Map[String, String] = Map(
    "join_fuzzy" ->
      """WITH names AS (SELECT p_name AS name, min(p_partkey) AS name_id
                        FROM part GROUP BY p_name),
           probe AS (SELECT name_id AS qid,
                            substr(name, 1, CAST(name_id % length(name) AS INT))
                              || 'z'
                              || substr(name, CAST(name_id % length(name) AS INT) + 2)
                              AS qname
                     FROM names),
           pseg AS (SELECT qid, qname, g.i, length(qname) AS l,
                           substr(qname, (g.i * length(qname)) // 3 + 1,
                                  ((g.i + 1) * length(qname)) // 3
                                    - (g.i * length(qname)) // 3) AS seg
                    FROM probe CROSS JOIN generate_series(0, 2) g(i)),
           nseg AS (SELECT name_id, name, g.i, length(name) AS l,
                           substr(name, (g.i * length(name)) // 3 + 1,
                                  ((g.i + 1) * length(name)) // 3
                                    - (g.i * length(name)) // 3) AS seg
                    FROM names CROSS JOIN generate_series(0, 2) g(i)),
           cand AS (SELECT DISTINCT p.qid, p.qname, n.name_id, n.name
                    FROM pseg p JOIN nseg n
                      ON n.i = p.i AND n.l = p.l AND n.seg = p.seg),
           hits AS (SELECT qid, name_id,
                           levenshtein(qname, name) AS dist
                    FROM cand WHERE levenshtein(qname, name) <= 2),
           agg AS (SELECT qid, count(*) AS n_matches, min(dist) AS min_dist
                   FROM hits GROUP BY qid),
           best AS (SELECT h.qid, min(h.name_id) AS best_id
                    FROM hits h JOIN agg a
                      ON a.qid = h.qid AND h.dist = a.min_dist
                    GROUP BY h.qid)
         SELECT a.qid, a.n_matches, a.min_dist, b.best_id
         FROM agg a JOIN best b USING (qid)
         ORDER BY a.qid LIMIT 300""",
    "set_union_byname" ->
      """WITH u AS (
           SELECT event_id, user_id, value, NULL AS props
           FROM events WHERE event_type = 'error'
           UNION ALL
           SELECT event_id, user_id, NULL AS value, props
           FROM events WHERE event_type = 'purchase')
         SELECT count(*) AS n, count(value) AS n_value, count(props) AS n_props,
                round(sum(value), 2) AS sum_value
         FROM u""",
    "sample_hash" ->
      """SELECT event_type, count(*) AS n_sample, round(avg(value), 2) AS avg_value
         FROM (SELECT *, CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                              AS BIGINT) % 100 AS hs
               FROM events)
         WHERE hs < 10 GROUP BY event_type ORDER BY event_type""",
    "sample_weighted" ->
      """WITH pri AS (
           SELECT event_id, event_type, value,
                  -ln((CAST('0x' || substr(md5('wsamp:' || CAST(event_id AS VARCHAR)),
                            1, 15) AS BIGINT) + 1.0) / 1152921504606846976.0)
                    / greatest(value, 0.001) AS pri
           FROM events)
         SELECT event_id, event_type, round(value, 2) AS value
         FROM (SELECT *, row_number() OVER (ORDER BY pri ASC, event_id ASC) AS rn
               FROM pri)
         WHERE rn <= 100
         ORDER BY event_id""",
    "sample_stratified" ->
      """SELECT event_type, count(*) AS n_sample,
                round(sum(value), 2) AS sum_value, round(avg(value), 2) AS avg_value
         FROM (SELECT event_type, value,
                      row_number() OVER (
                        PARTITION BY event_type
                        ORDER BY CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                                   AS BIGINT) ASC, event_id ASC) AS rn
               FROM events)
         WHERE rn <= 50 GROUP BY event_type ORDER BY event_type""",
    "scan_parquet" ->
      """SELECT count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
         round(sum(l_quantity), 2) AS sum_qty FROM lineitem""",
    "sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
         ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",
    "sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "set_union" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM (SELECT l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'A'
               UNION ALL
               SELECT l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'R')
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "set_intersect" ->
      """SELECT l_orderkey FROM lineitem
         INTERSECT
         SELECT o_orderkey AS l_orderkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY l_orderkey LIMIT 100""",
    "set_except" ->
      """SELECT o_orderkey FROM orders
         EXCEPT
         SELECT l_orderkey AS o_orderkey FROM lineitem
         ORDER BY o_orderkey LIMIT 100""",
    "dedup_exact" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                      row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
               FROM lineitem)
         WHERE rn = 1 ORDER BY l_orderkey LIMIT 200""",
    "join_broadcast" ->
      """SELECT o_orderkey, o_orderdate,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "join_sortmerge" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_outer" ->
      """SELECT o_orderstatus, count(*) AS n_orders, count(c_custkey) AS n_matched,
                round(sum(c_acctbal), 2) + 0.0 AS sum_bal
         FROM orders LEFT JOIN customer
           ON o_custkey = c_custkey AND c_acctbal > 5000.0
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey LIMIT 100""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey LIMIT 100""",
    "join_range" ->
      """SELECT CAST(bucket_id AS BIGINT) AS bucket_id, count(*) AS n,
                round(sum(value), 2) AS sum_value
         FROM events
         JOIN (VALUES (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0),
                      (3, 150.0, 200.0), (4, 200.0, 1e9)) AS b(bucket_id, lo, hi)
           ON value >= lo AND value < hi
         GROUP BY bucket_id ORDER BY bucket_id""",
    "join_range_banded" ->
      """WITH iv AS (SELECT user_id AS uid, min(value) AS lo, max(value) AS hi
                     FROM events GROUP BY 1)
         SELECT uid, count(*) AS n, round(sum(e.value), 2) AS sum_v
         FROM iv JOIN events e ON e.value >= iv.lo AND e.value < iv.hi
         GROUP BY uid ORDER BY uid""",
    // per-width band-count arithmetic (n_cand = Σ_band np·ni), matched
    // count via the width-free theta form (each true pair counted once —
    // identical to any banded materialization)
    "join_range_tuning" -> {
      val widths = Seq(5, 25, 100, 400)
      val per = widths.map { w =>
        s"""np_$w AS (SELECT CAST(floor(value / $w) AS BIGINT) AS band,
                            count(*) AS np
                     FROM events GROUP BY 1),
           ni_$w AS (SELECT band, count(*) AS ni FROM (
                       SELECT unnest(generate_series(
                         CAST(floor(lo / $w) AS BIGINT),
                         CAST(floor(hi / $w) AS BIGINT))) AS band
                       FROM iv) GROUP BY 1),
           s_$w AS (SELECT CAST($w AS BIGINT) AS width,
                           (SELECT CAST(sum(ni) AS BIGINT) FROM ni_$w)
                             AS n_index_rows,
                           (SELECT CAST(sum(np * ni) AS BIGINT)
                            FROM np_$w JOIN ni_$w USING (band)) AS n_cand)"""
      }.mkString(",\n")
      val un = widths.map(w => s"SELECT * FROM s_$w").mkString(" UNION ALL ")
      s"""WITH iv AS (SELECT user_id AS uid, min(value) AS lo, max(value) AS hi
                      FROM events GROUP BY 1),
           nn AS (SELECT count(*) AS n_intervals FROM iv),
           mm AS (SELECT count(*) AS n_matched
                  FROM iv JOIN events e ON e.value >= iv.lo AND e.value < iv.hi),
           $per
         SELECT width, n_intervals, n_index_rows, n_cand, n_matched,
                CAST(1000 * n_index_rows // n_intervals AS BIGINT) AS repl_pm,
                CAST(1000 * n_matched // n_cand AS BIGINT) AS precision_pm
         FROM ($un) CROSS JOIN nn CROSS JOIN mm
         ORDER BY width"""
    },
    "join_asof" ->
      """SELECT p_id, user_id, p_ts, s_ts
         FROM (SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts, s.ts AS s_ts,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY s.ts DESC NULLS LAST) AS rn
               FROM (SELECT * FROM events WHERE event_type = 'purchase') p
               LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                 ON p.user_id = s.user_id AND s.ts <= p.ts)
         WHERE rn = 1 ORDER BY p_id LIMIT 300""",
    "join_interval" ->
      """WITH sess AS (SELECT user_id, event_type,
                             min(ts) AS a_start, max(ts) AS a_end
                      FROM events GROUP BY 1, 2),
           sb AS (SELECT user_id, event_type, a_start, a_end,
                         unnest(range(CAST(floor(epoch(a_start)) AS BIGINT) // 86400,
                                      CAST(floor(epoch(a_end)) AS BIGINT) // 86400 + 1))
                           AS band
                  FROM sess),
           wins AS (SELECT k AS win_id,
                           TIMESTAMP '2024-01-01 00:00:00' + to_hours(k * 12)
                             AS w_start,
                           TIMESTAMP '2024-01-01 00:00:00' + to_hours(k * 12 + 4)
                             AS w_end
                    FROM range(0, 60) t(k)),
           wb AS (SELECT win_id, w_start, w_end,
                         unnest(range(CAST(floor(epoch(w_start)) AS BIGINT) // 86400,
                                      CAST(floor(epoch(w_end)) AS BIGINT) // 86400 + 1))
                           AS band
                  FROM wins),
           hits AS (SELECT DISTINCT user_id, event_type, win_id,
                           a_start, w_start, a_end, w_end
                    FROM sb JOIN wb USING (band)
                    WHERE a_start <= w_end AND w_start <= a_end)
         SELECT user_id, event_type, win_id,
                CAST(floor(epoch(least(a_end, w_end))) AS BIGINT)
                - CAST(floor(epoch(greatest(a_start, w_start))) AS BIGINT)
                  AS overlap_s
         FROM hits
         ORDER BY user_id, event_type, win_id LIMIT 500""",
    "join_asof_tol" ->
      """SELECT p_id, user_id, p_ts,
                CASE WHEN gap_s <= 86400 THEN s_ts END AS s_ts,
                CASE WHEN gap_s <= 86400 THEN gap_s END AS gap_s
         FROM (SELECT p_id, user_id, p_ts, s_ts,
                      CAST(floor(epoch(p_ts)) AS BIGINT)
                      - CAST(floor(epoch(s_ts)) AS BIGINT) AS gap_s
               FROM (SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
                            s.ts AS s_ts,
                            row_number() OVER (PARTITION BY p.event_id
                                               ORDER BY s.ts DESC NULLS LAST) AS rn
                     FROM (SELECT * FROM events WHERE event_type = 'purchase') p
                     LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                       ON p.user_id = s.user_id AND s.ts <= p.ts)
               WHERE rn = 1)
         ORDER BY p_id LIMIT 300""",
    "join_cross" ->
      """SELECT r_name, flag
         FROM region CROSS JOIN (SELECT DISTINCT l_returnflag AS flag FROM lineitem)
         ORDER BY r_name, flag""")
}
