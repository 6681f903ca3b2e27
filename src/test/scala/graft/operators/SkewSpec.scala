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

    // and the shipped CONTENT salt really spreads the hot key: distinct
    // rows under one key hash to many salt groups
    val spread = df.withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(16L)))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(spread > 1, s"hot key landed in $spread salt group(s)")
  }

  test("property: salted ops equal plain ops on generated data with " +
      "duplicates and null keys") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // keys from a tiny alphabet (forces heavy duplication — the content
    // salt's documented trade-off), values from a small range so FULLY
    // identical rows occur; some null keys
    val row: Gen[(Option[String], Long)] = Gen.zip(
      Gen.frequency(
        8 -> Gen.oneOf("a", "b", "c").map(Some(_)),
        1 -> Gen.const(None)),
      Gen.chooseNum(0L, 9L))
    val data = Gen.listOfN(2000, row)
      .pureApply(Gen.Parameters.default, Seed(7L))
    val df = data.toDF("k", "v").repartition(5)

    val directAgg = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("hi"))
      .orderBy(asc_nulls_first("k")).collect().map(_.toString).toSeq
    val saltedAgg = Skew.saltedAggregate(df, Seq("k"),
        Seq(Skew.sum2("s", col("v")), Skew.count2("n"), Skew.max2("hi", col("v"))))
      .orderBy(asc_nulls_first("k")).collect().map(_.toString).toSeq
    assert(directAgg === saltedAgg)

    val dim = Seq(("a", 1L), ("c", 3L), ("zz", 9L)).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = df.join(dim, Seq("k"), jt)
        .orderBy(asc_nulls_first("k"), col("v")).collect().map(_.toString).toSeq
      val salted = Skew.saltedJoin(df, dim, "k", salts = 8, joinType = jt)
        .select("k", "v", "rv")
        .orderBy(asc_nulls_first("k"), col("v")).collect().map(_.toString).toSeq
      assert(plain === salted, s"joinType=$jt diverged on generated data")
    }
  }
}
