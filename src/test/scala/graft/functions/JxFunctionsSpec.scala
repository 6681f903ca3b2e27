package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.JxFunctions._

/** Properties and truth tables for the jx expression-language semantics
  * (SURVEY.md §5.3): null-skipping arithmetic, missing("")-as-null,
  * null-safe equality, first-marker string slicing. Data is ScalaCheck-
  * generated (fixed seed) and evaluated in ONE Spark job per property —
  * the property is checked row-wise against a Scala-side model. */
class JxFunctionsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 300): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val optDouble: Gen[Option[Double]] =
    Gen.frequency(3 -> Gen.chooseNum(-1e6, 1e6).map(Some(_)), 1 -> Gen.const(None))

  test("jxAdd skips missing operands; null only when ALL are missing") {
    val data = samples(Gen.zip(optDouble, optDouble))
    val got = data.toDF("a", "b")
      .select(jxAdd(col("a"), col("b")).as("r")).collect()
    data.zip(got).foreach { case ((a, b), row) =>
      val expected = (a, b) match {
        case (None, None) => None
        case _            => Some(a.getOrElse(0.0) + b.getOrElse(0.0))
      }
      val actual = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      assert(actual === expected, s"jxAdd($a, $b)")
    }
  }

  test("jxMult skips missing operands with unit identity; null iff all missing") {
    val data = samples(Gen.zip(optDouble, optDouble))
    val got = data.toDF("a", "b")
      .select(jxMult(col("a"), col("b")).as("r")).collect()
    data.zip(got).foreach { case ((a, b), row) =>
      val expected = (a, b) match {
        case (None, None) => None
        case _            => Some(a.getOrElse(1.0) * b.getOrElse(1.0))
      }
      val actual = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      assert(actual === expected, s"jxMult($a, $b)")
    }
  }

  test("jxDiv: null on zero divisor or any missing operand") {
    val divisor = Gen.frequency(
      3 -> Gen.chooseNum(-100.0, 100.0).map(Some(_)),
      1 -> Gen.const(Some(0.0)),
      1 -> Gen.const(None))
    val data = samples(Gen.zip(optDouble, divisor))
    val got = data.toDF("a", "b")
      .select(jxDiv(col("a"), col("b")).as("r")).collect()
    data.zip(got).foreach { case ((a, b), row) =>
      val expected = (a, b) match {
        case (Some(x), Some(y)) if y != 0.0 => Some(x / y)
        case _                              => None
      }
      val actual = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      assert(actual === expected, s"jxDiv($a, $b)")
    }
  }

  test("missing treats empty string as null; exists is its complement") {
    val rows = Seq(Some("x"), Some(""), None, Some(" "), Some("ab")).toDF("s")
      .select(missing(col("s")).as("m"), JxFunctions.exists(col("s")).as("e")).collect()
    assert(rows.map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq ===
      Seq((false, true), (true, false), (true, false), (false, true), (false, true)))
  }

  test("missingNum is plain null-ness for non-string types") {
    val rows = Seq(Some(1.0), None, Some(0.0)).toDF("v")
      .select(missingNum(col("v")).as("m")).collect()
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(false, true, false))
  }

  test("jxEq / jxNe null-safe truth table (missing == missing is TRUE)") {
    val data: Seq[(Option[String], Option[String])] = Seq(
      (Some("a"), Some("a")), (Some("a"), Some("b")),
      (Some("a"), None), (None, Some("a")), (None, None))
    val rows = data.toDF("a", "b")
      .select(jxEq(col("a"), col("b")).as("eq"), jxNe(col("a"), col("b")).as("ne"))
      .collect()
    val eqs = rows.map(_.getBoolean(0)).toSeq
    assert(eqs === Seq(true, false, false, false, true))
    assert(rows.map(_.getBoolean(1)).toSeq === eqs.map(!_))
  }

  test("strBetween slices from the FIRST left marker to the NEXT right marker") {
    val cases = Seq(
      ("pre[mid]post", Some("mid")),   // plain
      ("a|b|c]", Some("b|c")),         // repeated left marker: anchor on FIRST
      ("no markers here", None),       // left absent
      ("open[but never closed", None), // right absent
      ("[]", Some("")))                // empty between
    val leftRight = Map("pre[mid]post" -> ("[", "]"), "a|b|c]" -> ("|", "]"),
      "no markers here" -> ("[", "]"), "open[but never closed" -> ("[", "]"),
      "[]" -> ("[", "]"))
    cases.foreach { case (s, expected) =>
      val (l, r) = leftRight(s)
      val row = Seq(s).toDF("s").select(strBetween(col("s"), l, r).as("b")).head()
      val actual = if (row.isNullAt(0)) None else Some(row.getString(0))
      assert(actual === expected, s"strBetween($s, $l, $r)")
    }
  }

  test("jxFind returns 0-based index or missing (never -1)") {
    val rows = Seq("hello world", "nope", "x hello").toDF("s")
      .select(jxFind(col("s"), "hello").as("i")).collect()
    val got = rows.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got === Seq(Some(0), None, Some(2)))
  }

  test("jxLeft / jxRight are clamped slices and survive derived inputs") {
    // jxRight used to re-parse Column.toString through expr() — a derived
    // column (upper(...)) would have broken it
    val rows = Seq("abcdef", "ab").toDF("s")
      .select(
        jxLeft(col("s"), 3).as("l"),
        jxRight(upper(col("s")), 3).as("r")).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("abc", "DEF"), ("ab", "AB")))
  }

  test("jxNumber never throws: malformed strings coerce to null under ANSI") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val rows = Seq("3.5", "not-a-number", "", "-2").toDF("s")
      .select(jxNumber(col("s")).as("n")).collect()
    val got = rows.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(Some(3.5), None, None, Some(-2.0)))
  }

  test("jxFloor floors to a multiple of the modulus") {
    val rows = Seq(7.3, -0.1, 50.0).toDF("v")
      .select(jxFloor(col("v"), 0.5).as("f")).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(7.0, -0.5, 50.0))
  }
}
