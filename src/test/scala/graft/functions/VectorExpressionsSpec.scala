package graft.functions

import org.apache.spark.sql.functions._

/** DotProduct codegen expression vs the higher-order-function reference
  * form, plus null/length edge semantics. */
class VectorExpressionsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("DotProduct(float, float) equals the zip_with/aggregate reference form") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat()),
      Array.fill(64)(rnd.nextFloat())))
    val rows = data.toDF("a", "b")
      .withColumn("dp", DotProduct(col("a"), col("b")))
      .withColumn("ref", expr(
        """aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)),
                              transform(b, x -> CAST(x AS DOUBLE)),
                              (x, y) -> x * y),
                     CAST(0 AS DOUBLE), (acc, p) -> acc + p)"""))
      .select("dp", "ref").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("DotProduct handles double arrays, null arrays, and length mismatch") {
    val rows = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),   // 32
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))),       // prefix: 11
      (None, Some(Seq(1.0))),                                 // null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))     // 0
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("dp")).collect()
    assert(rows(0).getDouble(0) === 32.0)
    assert(rows(1).getDouble(0) === 11.0)
    assert(rows(2).isNullAt(0))
    assert(rows(3).getDouble(0) === 0.0)
  }

  test("null elements are skipped, not poisoning the sum") {
    val row = Seq((Seq(Some(2.0), None, Some(4.0)), Seq(Some(10.0), Some(10.0), Some(10.0))))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("dp")).head()
    assert(row.getDouble(0) === 60.0)
  }

  test("cosine of a vector with itself is 1") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(10)(Array.fill(32)(rnd.nextFloat())).toDF("v")
      .select(DotProduct.cosine(col("v"), col("v")).as("c")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("SortedIntersectCount equals size(array_intersect) on random sorted sets") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(19)
    val rows = (0 until 200).map { i =>
      val a = rnd.shuffle((0L until 500L).toList).take(1 + rnd.nextInt(80)).distinct.sorted
      val b = rnd.shuffle((0L until 500L).toList).take(1 + rnd.nextInt(80)).distinct.sorted
      (i, a, b)
    }
    val df = spark.createDataFrame(rows).toDF("i", "a", "b")
      .withColumn("fast", graft.functions.SortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("fast") =!= col("ref")).isEmpty)
    // empty-overlap and identical-set edges
    val edge = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L)), (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
      .withColumn("c", graft.functions.SortedIntersectCount(col("a"), col("b")))
    assert(edge.collect().map(_.getAs[Long]("c")).toSeq === Seq(0L, 2L))
  }
}
