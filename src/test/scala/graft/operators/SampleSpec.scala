package graft.operators

import org.apache.spark.sql.functions._
import Common._

/** The whole point of hash-mod sampling (`sample_hash`, SURVEY §2 O6) is
  * layout-invariance: a row's split assignment depends only on its natural
  * key, never on partitioning, execution order, or a seed — that's what
  * makes a train/eval split reproducible across pipeline reruns. */
class SampleSpec extends graft.SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sample_hash yields identical samples under repartitioning") {
    val base = graft.SparkEntry.queries("sample_hash")(spark, d)
      .collect().map(_.toString).toSeq
    val re = t(spark, d, "events").repartition(7)
      .withColumn("hs", expr(
        "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"))
      .filter(col("hs") < 10)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"), r2(avg("value")).as("avg_value"))
      .orderBy("event_type")
      .collect().map(_.toString).toSeq
    assert(base === re)
  }

  test("hash-mod slices partition the table (10% + 90% = all, disjoint)") {
    val ev = t(spark, d, "events").withColumn("hs", expr(
      "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"))
    val nAll = ev.count()
    val nIn = ev.filter(col("hs") < 10).count()
    val nOut = ev.filter(col("hs") >= 10).count()
    assert(nIn + nOut === nAll)
    // md5 is uniform: the 10% slice lands near 10% (loose 3x bounds)
    assert(nIn > nAll / 30 && nIn < nAll / 3, s"$nIn of $nAll")
  }

  test("sample_weighted oversamples heavy rows and is layout-invariant") {
    val base = graft.SparkEntry.queries("sample_weighted")(spark, d)
    val sample = base.collect()
    assert(sample.length > 0)
    // weight-proportional selection: the sample's mean value must clearly
    // exceed the population mean (weights ARE the values)
    val popMean = t(spark, d, "events").agg(avg("value")).head().getDouble(0)
    val sampleMean = base.agg(avg("value")).head().getDouble(0)
    assert(sampleMean > popMean * 1.3,
      s"weighted sample mean $sampleMean not above population mean $popMean")
    // md5-keyed priorities: identical selection under a different layout
    val ids = sample.map(_.getLong(0)).toSet
    val again = graft.SparkEntry.queries("sample_weighted")(spark, d)
      .collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }
}
