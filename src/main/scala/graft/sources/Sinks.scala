package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output routing (SURVEY.md §2.1 S5–S7).
  *
  * The reference stages JSON-lines to S3 (one object per etl key) and bulk
  * loads Elasticsearch daily indexes named `name_YYYYMMDD` (upstream:
  * sinks/s3_bucket.py, sinks/multi_day_index.py, push_to_es.py). The
  * Spark-native equivalent is a partitioned columnar layout: the partition
  * column IS the daily index — readers with a date predicate touch only
  * matching directories (partition pruning, the same query-time win the
  * reference gets from its index picker), and writers route each row by
  * its own timestamp in one pass, no per-day loop.
  */
object Sinks {

  /** S7: daily-index router — `partitionBy(day)` writes every row to its
    * day's directory in a single job. Dynamic partition overwrite keeps
    * re-ETL idempotent per day (only days present in `df` are rewritten).
    * SinksSpec proves pruning: a `day = X` read plans only that partition. */
  def dailyRouter(df: DataFrame, dir: String, tsCol: String = "ts"): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("day", date_format(col(tsCol), "yyyyMMdd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
  }

  /** S6: staged JSON-lines sink, one directory per etl key (the S3 staging
    * layout; gzip via codec to match the reference's .json.gz objects). */
  def jsonLinesStaged(df: DataFrame, dir: String, keyCol: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol)
      .option("compression", "gzip").json(dir)
}
