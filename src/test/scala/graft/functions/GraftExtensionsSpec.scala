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
}
