package graft.functions

/** SQL-surface registration of the custom expressions. */
class GraftExtensionsSpec extends graft.SparkSpec {

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
                poly_hash64('hello') AS ph,
                simhash64(array('a', 'b')) AS sh,
                poly_hash64('') AS ph_empty""").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(3) === PolyHash64.Seed) // FNV offset basis golden
    // cross-check SQL vs Column API on the same inputs
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaCols = Seq(("hello", Seq("a", "b"))).toDF("s", "toks")
      .select(PolyHash64(col("s")).as("ph"), SimHash64(col("toks")).as("sh")).head()
    assert(r.getLong(1) === viaCols.getLong(0))
    assert(r.getLong(2) === viaCols.getLong(1))
    // registration is idempotent
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1.0D), array(2.0D))").head().getDouble(0) === 2.0)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L))")
      .head().getLong(0) === 2L)
  }

  test("sketch probe functions reach SQL: bloom, cms, tdigest") {
    GraftExtensions.register(spark)
    spark.range(0, 100)
      .selectExpr("id").createOrReplaceTempView("keys_ext")
    // build each sketch via the Column API, probe it via the SQL surface
    import org.apache.spark.sql.functions._
    val bf = spark.table("keys_ext")
      .agg(BloomSketchAgg(col("id")).as("bf")).head().getAs[Array[Byte]](0)
    val td = spark.table("keys_ext")
      .agg(TDigestSketchAgg(col("id"))).head().getAs[Array[Byte]](0)
    spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(bf, td)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bf",
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("td",
            org.apache.spark.sql.types.BinaryType))))
      .createOrReplaceTempView("sketches_ext")
    val r = spark.sql(
      """SELECT bloom_probe_row(bf, 42L) AS hit,
                bloom_probe_row(bf, 123456789L) AS miss,
                tdigest_quantile(td, 0.5D) AS p50
         FROM sketches_ext""").head()
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(math.abs(r.getDouble(2) - 49.5) < 2.0)
    // cms: sketch via built-in aggregate, probe via the registered fn
    val est = spark.sql(
      """SELECT cms_estimate_count(
                  (SELECT count_min_sketch(id, 0.001d, 0.999d, 7) FROM keys_ext),
                  5L) AS est""").head().getLong(0)
    assert(est === 1L)
  }
}
