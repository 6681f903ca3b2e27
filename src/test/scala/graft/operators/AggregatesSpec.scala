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
