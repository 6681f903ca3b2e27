package graft.functions

import org.apache.spark.sql.functions._

/** In-plan count-min-sketch probe ([[CmsEstimateCount]]): the CMS
  * structural guarantee (estimate ≥ true count, always — overcount only)
  * must survive the whole serialize → broadcast → per-row-probe path,
  * on generated data with heavy duplication. */
class CmsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("property: cms_estimate_count never undercounts, on any generated key mix") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // zipf-ish mix: a few hot keys plus a long tail
    val key: Gen[Long] = Gen.frequency(
      5 -> Gen.oneOf(1L, 2L, 3L),
      3 -> Gen.chooseNum(10L, 50L),
      2 -> Gen.chooseNum(100L, 10000L))
    val data = Gen.listOfN(5000, key).pureApply(Gen.Parameters.default, Seed(11L))
    val df = data.toDF("k").repartition(7)

    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.9999d, 42)").as("cms"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("n_exact"))
    val probed = exact.crossJoin(broadcast(sk))
      .select(col("k"), col("n_exact"),
        CmsEstimateCount(col("cms"), col("k")).as("n_est"))
      .collect()
    assert(probed.nonEmpty)
    probed.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted key ${r.getLong(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // and a key never inserted estimates low (eps·N bound, far below the
    // hot keys' true counts)
    val ghost = sk.select(CmsEstimateCount(col("cms"), lit(999999999L)))
      .head().getLong(0)
    assert(ghost <= (0.001 * data.size).toLong + 1, s"ghost key estimate $ghost")
  }
}
