package graft.operators

import org.apache.spark.sql.functions._

/** Salted two-phase aggregation must be exactly equivalent to the direct
  * groupBy for decomposable aggregates — including on a pathologically
  * skewed key distribution. */
class SkewSpec extends graft.SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join on a skewed key") {
    val rows = (1 to 20000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "HOT"
      (k, i.toLong)
    }
    val left = rows.toDF("k", "lv").repartition(8)
    val right = (Seq("HOT", "k0", "k3", "unmatched"))
      .zipWithIndex.map { case (k, i) => (k, i * 100) }.toDF("k", "rv")

    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
        .orderBy("k", "lv").collect().map(_.toString).toSeq
      val salted = Skew.saltedJoin(left, right, "k", salts = 8, joinType = jt)
        .select("k", "lv", "rv")
        .orderBy("k", "lv").collect().map(_.toString).toSeq
      assert(plain === salted, s"joinType=$jt diverged")
    }
  }

  test("saltedAggregate equals direct groupBy on a skewed distribution") {
    // 90% of rows share one hot key
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "HOT"
      (k, i.toDouble)
    }
    val df = rows.toDF("k", "v").repartition(8)

    val direct = df.groupBy("k").agg(
      sum("v").as("s"), count(lit(1)).as("n"),
      min("v").as("lo"), max("v").as("hi"))

    val salted = Skew.saltedAggregate(df, Seq("k"), Seq(
      Skew.sum2("s", col("v")), Skew.count2("n"),
      Skew.min2("lo", col("v")), Skew.max2("hi", col("v"))))

    val d = direct.orderBy("k").collect().map(_.toString).toSeq
    val s = salted.orderBy("k").collect().map(_.toString).toSeq
    assert(d === s)

    // and the partial pass really spreads the hot key: more than one
    // (key, salt) group exists for HOT
    val spread = df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(16)))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(spread > 1, s"hot key landed in $spread salt group(s)")
  }
}
