package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works exactly like the
  * Column API (SURVEY.md §2.10: the extension point the reference exposes
  * by subclassing jx Expression maps to FunctionRegistry +
  * SparkSessionExtensions here).
  *
  * Two entry points:
  *  - config-driven: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the production cluster path — every session picks them up);
  *  - programmatic: `GraftExtensions.register(spark)` on a live session
  *    (used by tests and notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", "", name, usage, "", "", "", "",
      "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product", "_FUNC_(a, b) - dot product of two numeric arrays (nulls skip)"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("poly_hash64",
      info("poly_hash64", "_FUNC_(str) - 64-bit FNV-1a rolling hash of a string"),
      (es: Seq[Expression]) => PolyHash64(es.head)),
    ("simhash64",
      info("simhash64", "_FUNC_(tokens) - 64-bit SimHash signature of a token array"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("sorted_intersect_count",
      info("sorted_intersect_count",
        "_FUNC_(a, b) - |a intersect b| for two ascending-sorted long arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    ("bloom_might_contain",
      info("bloom_might_contain",
        "_FUNC_(filter, key) - probe a FOLDABLE serialized Bloom filter for a BIGINT key"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1))),
    ("bloom_probe_row",
      info("bloom_probe_row",
        "_FUNC_(filter, key) - probe a per-row Bloom filter column (response-scale rows)"),
      (es: Seq[Expression]) => BloomProbeRow(es(0), es(1))),
    ("cms_estimate_count",
      info("cms_estimate_count",
        "_FUNC_(sketch, key) - estimated count of a BIGINT key in a serialized count-min sketch"),
      (es: Seq[Expression]) => CmsEstimateCount(es(0), es(1))),
    ("tdigest_quantile",
      info("tdigest_quantile",
        "_FUNC_(sketch, q) - quantile estimate from a serialized t-digest"),
      (es: Seq[Expression]) => TDigestQuantile(es(0), es(1))))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
