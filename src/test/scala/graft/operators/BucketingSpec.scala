package graft.operators

import org.apache.spark.sql.functions._

/** Proof that bucketed writes buy exchange-free joins: the scale claim in
  * [[Bucketing]]'s doc must be visible in the physical plan, same policy
  * as PlanAuditSpec. */
class BucketingSpec extends graft.SparkSpec {

  test("join of two co-bucketed tables plans ZERO exchanges and correct rows") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the broadcast threshold
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and the result is the plain join's result
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() === expected)

      // a groupBy on the bucket key rides the same pre-shuffle
      val aggPlan = spark.table("b_lineitem").groupBy("o_orderkey")
        .agg(sum("l_quantity")).queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$aggPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("a DRIVER-SHAPED consumer rides the bucket pre-shuffle end-to-end: " +
    "the funnel's three user-keyed group-bys + two user joins plan zero " +
    "hash-partition exchanges over bucketed events") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.t(spark, sf, "events")
    Bucketing.writeBucketed(events, "b_events", "user_id", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val funnel = graft.etl.Transforms.funnelOf(spark.table("b_events"))
      val plan = funnel.queryExecution.executedPlan.toString
      // every user-keyed stage (groupBy user_id; join on user_id) must
      // reuse the bucket layout — the only exchanges left are the final
      // KB-scale single-partition/broadcast collectors of the 3-row readout
      assert(!plan.contains("Exchange hashpartitioning"),
        s"funnel over bucketed events still hash-shuffles:\n$plan")
      // and the pre-shuffled path computes the plain path's answer
      val expected = graft.etl.Transforms.funnelOf(events).collect().toSeq
      assert(funnel.collect().toSeq === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_events")
    }
  }
}
