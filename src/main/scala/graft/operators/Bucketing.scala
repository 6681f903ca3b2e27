package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed (pre-shuffled) tables — the storage-level lever for repeated
  * big-big joins (SURVEY.md §4). A join between two tables bucketed AND
  * sorted by the join key into the same bucket count needs no exchange
  * and no sort at read time: every shuffle a downstream query would pay
  * per run is paid ONCE at write time. At 100 TB this converts the
  * nightly fact-to-fact join from the cluster's dominant shuffle into a
  * streaming zip of co-located files. The reference has no equivalent
  * (single-node scans repay the full cost per query); this is pure
  * engine-side capability, proven exchange-free in BucketingSpec.
  *
  * Use the session catalog (`saveAsTable`): bucketing metadata lives in
  * the catalog, not the parquet files — a plain `.parquet(path)` write
  * silently drops it.
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` into `buckets` buckets as a
    * catalog table. Joins (and groupBys) on `key` between tables written
    * with the same `buckets` skip the exchange entirely. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Equi-join two same-bucket-count tables on `key` — a plain join; the
    * exchange-free plan comes from the bucket metadata, not from hints. */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
