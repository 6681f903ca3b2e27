package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the operator inventory (SURVEY.md §2).
  *
  * Determinism policy (SURVEY.md §7.4): every oracle'd query ends in a total
  * order and rounds double aggregates to 2 decimals in BOTH engines, so the
  * driver's hash compare sees bit-identical values.
  */
object Common {
  type Q = (SparkSession, String) => DataFrame

  /** Round a double aggregate for oracle-stable output. */
  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.Tables.t(spark, sfDir, name)

  /** Fan CPU-heavy per-row work out to every core when the input arrives
    * under-parallel. A parquet scan can never have more tasks than row
    * groups, and this corpus ships ONE row group per table — so any heavy
    * per-row chain (regex hygiene, rule decoration, payload decode)
    * fused into the scan stage runs on a single core no matter how many
    * the session has (measured: the rule-gate keep list was one 6.5 s
    * single-task job at local[32]). On a production-scale input the scan
    * already carries ≥ cores splits and this is a NO-OP — the exchange
    * only exists where the data layout, not the algorithm, starves the
    * job of parallelism (guide §2.5 "input skew: one unsplittable file —
    * repartition immediately after the read"). Hash-partitioned on `key`
    * (deterministic under retries; no round-robin pre-sort), and every
    * consumer is partition-order-invariant by the repo's determinism
    * policy (decimal sums, rounded decisions, total-order tails) — the
    * driver already benches the same keys at different core counts. */
  def spread(df: DataFrame, key: String = "doc_id"): DataFrame = {
    // streaming frames can't be planned eagerly (and micro-batches get
    // their parallelism from the source) — leave them untouched
    if (df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions >= sc.defaultParallelism) df
    else df.repartition(sc.defaultParallelism, col(key))
  }
}
