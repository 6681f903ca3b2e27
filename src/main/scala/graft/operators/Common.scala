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
}
