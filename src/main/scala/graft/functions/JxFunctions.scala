package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** jx expression-language semantics as `Column` helpers.
  *
  * The reference's scalar language (upstream: jx_base/expressions/, evaluated
  * per-row by jx_python/expressions.py) has null conventions that differ from
  * ANSI SQL in three load-bearing ways (SURVEY.md §2.2):
  *
  *   1. "missing" includes the empty string, not just null;
  *   2. `eq` is null-safe (missing == missing -> true);
  *   3. variadic arithmetic skips missing operands (add(1, null) = 1) but is
  *      null only when ALL operands are missing (add(null, null) = null).
  *
  * Encoding these once as composable `Column` functions keeps every query on
  * Catalyst built-ins — whole-stage codegen applies, no UDFs anywhere
  * (SURVEY.md §2.10 policy). Each helper is a pure expression-tree rewrite,
  * so constant folding / predicate pushdown still see through it.
  */
object JxFunctions {

  /** jx `missing`: null, or empty string for string-typed columns.
    * Upstream: jx_base/expressions (MissingOp); mo_dots treats "" as Null.
    */
  def missing(c: Column): Column = c.isNull || (c === lit(""))

  /** jx `missing` for non-string columns (no empty-string convention). */
  def missingNum(c: Column): Column = c.isNull

  /** jx `exists`: present and non-empty. */
  def exists(c: Column): Column = !missing(c)

  /** jx variadic `add`: skip missing operands; null iff all missing.
    * add(1, null) = 1; add(null, null) = null.
    * Upstream: jx_base/expressions (AddOp with nulls=True semantics).
    */
  def jxAdd(cols: Column*): Column = {
    val allNull = cols.map(_.isNull).reduce(_ && _)
    val summed  = cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
    when(allNull, lit(null)).otherwise(summed)
  }

  /** jx `mult` with the same skip-missing convention. */
  def jxMult(cols: Column*): Column = {
    val allNull = cols.map(_.isNull).reduce(_ && _)
    val prod    = cols.map(c => coalesce(c, lit(1.0))).reduce(_ * _)
    when(allNull, lit(null)).otherwise(prod)
  }

  /** jx `div`: null on division by zero or missing operands (the reference's
    * `div` takes an optional `default`; callers coalesce for that).
    * Upstream: jx_base/expressions (DivOp).
    */
  def jxDiv(a: Column, b: Column): Column =
    when(b === 0 || b.isNull || a.isNull, lit(null)).otherwise(a / b)

  /** jx `floor(x, modulo)`: x floored to a multiple of m — the primitive
    * under jx histogram/range domains. Upstream: mo_math (floor with mod).
    */
  def jxFloor(x: Column, m: Double): Column = floor(x / m) * m

  /** jx `eq`: null-safe equality (missing == missing is TRUE).
    * Upstream: jx_base/expressions (EqOp). Maps to Catalyst `EqualNullSafe`.
    */
  def jxEq(a: Column, b: Column): Column = a <=> b

  /** jx `ne`: strict complement of jxEq. */
  def jxNe(a: Column, b: Column): Column = !(a <=> b)

  /** jx string `between {from, to}`: the substring strictly between the
    * first `left` marker and the next `right` marker; null when either
    * marker is absent. Upstream: jx_base/expressions (BetweenOp).
    */
  def strBetween(s: Column, left: String, right: String): Column = {
    // slice from the FIRST `left` marker (locate), then up to the next
    // `right`; substring_index(-1) would anchor on the LAST occurrence.
    val afterLeft = when(locate(left, s) > 0,
      substring(s, locate(left, s) + lit(left.length), length(s)))
      .otherwise(lit(null))
    when(afterLeft.isNull || locate(right, afterLeft) === 0, lit(null))
      .otherwise(substring(afterLeft, lit(1), locate(right, afterLeft) - 1))
  }

  /** jx `find`: 0-based index of substring, missing when absent.
    * Upstream: jx_base/expressions (FindOp — returns missing, not -1).
    */
  def jxFind(s: Column, sub: String): Column =
    when(locate(sub, s) === 0, lit(null)).otherwise(locate(sub, s) - 1)

  /** jx `left` / `right` / `not_left` / `not_right`: clamped slices.
    * Upstream: jx_base/expressions (string slice family).
    */
  def jxLeft(s: Column, n: Int): Column  = substring(s, 1, n)
  // negative-start substring IS the right-slice; no SQL re-parsing of Column
  def jxRight(s: Column, n: Int): Column = substring(s, -n, n)

  /** jx coercions `number`/`string` that never throw: null on malformed
    * input even under ANSI mode (Spark 4 default).
    */
  def jxNumber(c: Column): Column = c.try_cast(org.apache.spark.sql.types.DoubleType)
}
