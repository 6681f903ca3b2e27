package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Common._

/** Skew mitigation for aggregations (SURVEY.md §4 — the reference splits
  * oversized keys manually in sinks/split.py; Spark's AQE handles skewed
  * JOINS at runtime but a skewed groupBy still funnels one hot key's rows
  * into one reducer).
  *
  * `saltedAggregate` is the standard two-phase rewrite: aggregate on
  * (key, salt) first — the hot key's rows spread over `salts` reducers —
  * then combine the partials per key. Only works for aggregates with a
  * partial/merge decomposition; the common ones are provided. At 100 TB
  * this is the difference between a stage pegged on one executor and an
  * even spread.
  */
object Skew {

  /** Aggregate spec: the partial pass runs `partial(value)` per
    * (key, salt); the merge pass combines partials per key. */
  case class SaltedAgg(name: String, partial: Column, merge: String => Column)

  def sum2(name: String, c: Column): SaltedAgg =
    SaltedAgg(name, sum(c).as(name), n => sum(col(n)).as(n))
  def count2(name: String): SaltedAgg =
    SaltedAgg(name, count(lit(1)).as(name), n => sum(col(n)).as(n))
  def min2(name: String, c: Column): SaltedAgg =
    SaltedAgg(name, min(c).as(name), n => min(col(n)).as(n))
  def max2(name: String, c: Column): SaltedAgg =
    SaltedAgg(name, max(c).as(name), n => max(col(n)).as(n))

  /** Deterministic per-row salt: hashed from the FULL row content, never
    * from partition/row position. Position-derived salts
    * (spark_partition_id + monotonically_increasing_id) are the
    * SPARK-23207 failure class: when a map task is recomputed after a
    * fetch failure, upstream row order can differ, the recomputed rows get
    * DIFFERENT salts, and reducers holding mixed generations double-count
    * or drop rows. A content hash re-derives the identical salt on every
    * recomputation. Trade-off: byte-identical duplicate rows share a salt
    * — acceptable, since real hot keys (one user, many distinct events)
    * still spread, and correctness under retry is non-negotiable. */
  private def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Two-phase salted groupBy: spreads each key over `salts` partial
    * groups, then merges. Equivalent to `df.groupBy(keys).agg(...)` for
    * decomposable aggregates (proven in SkewSpec). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.name),
        aggs.tail.map(a => a.merge(a.name)): _*)
  }

  /** Skew-salted equi-join for INNER/LEFT joins: the skewed probe side
    * gets a per-row salt in [0, salts); the build side is replicated once
    * per salt (explode, no shuffle of its own) and the join key becomes
    * (key, salt) — the hot key's rows land on `salts` reducers instead of
    * one. Row-identical to the plain join for inner/left semantics (each
    * probe row meets each matching build row exactly once, under exactly
    * one salt). Build-side shuffle volume grows ×salts — size `salts` ≈
    * hot-key rows ÷ healthy-partition rows. Use when AQE's runtime skew
    * split can't kick in (first shuffle of a stage, misleading stats, or
    * a deterministic plan is required); RIGHT/FULL joins would duplicate
    * unmatched build rows per salt — not supported here. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val l = left.withColumn("__salt", contentSalt(left, salts))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Driver gate for [[saltedJoin]]: a DELIBERATELY hot probe side —
    * every third user_id folds into key 1, so one key carries ~33% of
    * events (the one-reducer-pegged shape) — joined to the customer dim
    * on the salted (key, __salt) pair, then aggregated per market
    * segment. The hot key is 1, not 0: custkeys start at 1, so the hot
    * slice SURVIVES the inner join and actually flows through the salted
    * path (a hot key absent from the dim would make the demo vacuous —
    * the skewed rows would just vanish). Row-identical to the plain join
    * by construction (each probe row meets each matching build row under
    * exactly one salt), which is what the oracle SQL asserts: it runs
    * the UNSALTED join. PlanAuditSpec pins the physical shape —
    * build-side salt explode present, join keys carry __salt. */
  val joinSkewSalted: Q = (s, d) => {
    val ev = t(s, d, "events")
      .withColumn("hot_key",
        when(col("user_id") % 3 === 0, lit(1L)).otherwise(col("user_id")))
      .select("hot_key", "value")
    val dim = t(s, d, "customer")
      .select(col("c_custkey").as("hot_key"), col("c_mktsegment"))
    saltedJoin(ev, dim, "hot_key", salts = 16)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, Q] = Map("join_skew_salted" -> joinSkewSalted)

  val oracle: Map[String, String] = Map(
    "join_skew_salted" ->
      """WITH ev AS (
           SELECT CASE WHEN user_id % 3 = 0 THEN 1 ELSE user_id END AS hot_key,
                  value
           FROM events)
         SELECT c.c_mktsegment,
                count(*) AS n_events,
                round(sum(e.value), 2) AS total_value
         FROM ev e JOIN customer c ON c.c_custkey = e.hot_key
         GROUP BY c.c_mktsegment
         ORDER BY c.c_mktsegment""")
}
