package graft.operators

import org.apache.spark.sql.functions._

/** The approximate scale paths behind A8/A9: the oracle-gated queries use
  * exact countDistinct/percentile (DuckDB must reproduce them bit-for-bit);
  * at 100 TB the real operators are HLL++ and approx percentile. These
  * tests bound the approximation error on the driver's own data so the
  * swap is a one-line change with a known contract. */
class AggregatesSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("A8 scale path: approx_count_distinct within 5% of exact per group") {
    val ev = graft.Tables.t(spark, sf, "events")
    val both = ev.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx"))
    both.collect().foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }
  }

  test("daily partial aggregates re-merge exactly; HLL sketches union across days") {
    // the reference's storage model: ETL writes per-day indices, queries
    // re-aggregate across days. That only works when every aggregate is
    // MERGEABLE: count/sum/min/max re-combine exactly, and cardinality
    // must be carried as a sketch (a per-day countDistinct CANNOT be
    // summed — users active on two days double-count). Datasketches HLL
    // (hll_sketch_agg → hll_union_agg) is the carrier at 100 TB.
    val ev = graft.Tables.t(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
    val daily = ev.groupBy("day", "event_type").agg(
      count(lit(1)).as("n"), sum("value").as("sv"),
      min("value").as("mn"), max("value").as("mx"),
      hll_sketch_agg(col("user_id")).as("hll"))
    val merged = daily.groupBy("event_type").agg(
      sum("n").as("n"), sum("sv").as("sv"),
      min("mn").as("mn"), max("mx").as("mx"),
      hll_sketch_estimate(hll_union_agg(col("hll"))).as("users_est"))
    val direct = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("value").as("sv"),
      min("value").as("mn"), max("value").as("mx"),
      countDistinct(col("user_id")).as("users"))
    val m = merged.collect().map(r => r.getAs[String]("event_type") -> r).toMap
    direct.collect().foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(m(et).getAs[Long]("n") === r.getAs[Long]("n"))
      // double sums re-associate across the merge — exact to fp noise
      assert(math.abs(m(et).getAs[Double]("sv") - r.getAs[Double]("sv"))
        <= 1e-6 * math.abs(r.getAs[Double]("sv")))
      assert(m(et).getAs[Double]("mn") === r.getAs[Double]("mn"))
      assert(m(et).getAs[Double]("mx") === r.getAs[Double]("mx"))
      val exact = r.getAs[Long]("users").toDouble
      assert(math.abs(m(et).getAs[Long]("users_est") - exact) / exact <= 0.05,
        s"$et: hll=${m(et).getAs[Long]("users_est")} exact=$exact")
    }
  }

  test("A9 scale path: percentile_approx brackets the exact percentile") {
    val ev = graft.Tables.t(spark, sf, "events")
    val both = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("percentile_approx(value, 0.5, 1000)").as("approx"),
      min("value").as("lo"), max("value").as("hi"))
    both.collect().foreach { r =>
      val exact = r.getAs[Double]("exact")
      val approx = r.getAs[Double]("approx")
      val span = r.getAs[Double]("hi") - r.getAs[Double]("lo")
      assert(math.abs(approx - exact) <= 0.05 * span,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }
  }
}
