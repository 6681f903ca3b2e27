package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference (klahnakoski/TestLog-ETL) reads JSON-lines documents from
  * S3 buckets (upstream: pyLibrary/aws/s3.py) and Elasticsearch indexes
  * (upstream: pyLibrary/env/elasticsearch.py); this engine's native store is
  * columnar parquet, scanned through Spark's vectorized reader so filter
  * pushdown and column pruning happen at the scan (SURVEY.md §4).
  */
object Tables {
  /** Scan one table. Kept as a plain `spark.read.parquet` so Catalyst sees
    * a V1 FileScan it can push filters/projections into — do not collect or
    * cache here; callers compose lazily.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Session-level conf, set here so even a caller-provided session (the
    // driver's smoke check) can read the TIMESTAMP(NANOS) events table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    normalizeNanoTimestamps(df)
  }

  /** The driver's `events` table carries TIMESTAMP(NANOS) parquet columns,
    * which Spark reads only as raw longs (`spark.sql.legacy.parquet
    * .nanosAsLong=true`, set in Verify/Bench/test sessions). Convert to
    * micros TimestampType here — `div 1000` truncates exactly like DuckDB's
    * nanos→micros read, so oracle compares stay bit-identical.
    */
  private def normalizeNanoTimestamps(df: DataFrame): DataFrame =
    df.schema.fields.filter(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType)
      .foldLeft(df) { (acc, f) =>
        acc.withColumn(f.name,
          org.apache.spark.sql.functions.expr(s"timestamp_micros(${f.name} div 1000)"))
      }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
