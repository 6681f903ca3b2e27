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
  def dailyRouter(df: DataFrame, dir: String, tsCol: String = "ts"): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyyMMdd"))
      // writer-scoped option, NOT session conf: a session-level dynamic
      // mode would silently change overwrite semantics for every later
      // partitioned write on the shared session
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(dir)

  /** S6: staged JSON-lines sink, one directory per etl key (the S3 staging
    * layout; gzip via codec to match the reference's .json.gz objects). */
  def jsonLinesStaged(df: DataFrame, dir: String, keyCol: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol)
      .option("compression", "gzip").json(dir)

  /** S8 (engine addition): partition compaction — the maintenance pass
    * every streaming/partitioned sink needs at scale. Each micro-batch
    * and each idempotent re-ETL appends its own files, so a day's
    * directory decays into thousands of KB-sized parquet files; scans
    * then pay per-file open/footer costs and executors schedule
    * per-file tasks (the "small files problem" — at 100 TB the
    * difference between a scan dominated by S3 GETs and one dominated
    * by bytes). Compaction rewrites each partition to
    * ⌈bytes / targetBytes⌉ files ATOMICALLY per partition via dynamic
    * partition overwrite — readers never see a partial partition, and
    * only partitions present in the rewrite are touched (same
    * idempotency contract as the daily router).
    *
    * Rewrites everything it reads; an incremental driver would pass a
    * predicate selecting only decayed partitions (e.g. yesterday's). */
  def compactPartitions(spark: org.apache.spark.sql.SparkSession, dir: String,
      partitionCol: String, targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(dir)
    // current size per partition, from the file index (no data pass)
    val files = df.inputFiles
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val sizes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val part = p.getParent.getName // e.g. "day=20240101"
      part -> fs.getFileStatus(p).getLen
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val nFiles = sizes.map { case (k, bytes) =>
      k -> math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    }
    nFiles.foreach { case (partDir, n) =>
      val Array(colName, value) = partDir.split("=", 2)
      // localCheckpoint materializes the partition BEFORE the overwrite —
      // Spark (rightly) refuses to overwrite a path a live plan still
      // reads; the checkpoint breaks that file dependency and makes the
      // per-partition swap safe
      df.filter(col(colName) === value)
        .localCheckpoint()
        .repartition(n)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(dir)
    }
  }

  /** S5: Elasticsearch bulk sink — each row becomes the bulk API's
    * action/source line pair (`{"index":{"_index":…,"_id":…}}` then the
    * document JSON), routed to a daily index `<name>_YYYYMMDD` by the
    * row's own timestamp. With a real ES connector this would be
    * `df.write.format("es")`; the sandbox has no connector, so the sink
    * materializes exactly what `push_to_es` POSTs: one gzip NDJSON bulk
    * body per daily index (a consumer replays each file against
    * `/_bulk`). Explicit `_id` keeps re-delivery idempotent on the ES
    * side (same id → overwrite, the reference's dedup story). Entirely
    * in-plan: `to_json` + `concat` under codegen, one pass, writers
    * partitioned by target index. */
  def esBulk(df: DataFrame, dir: String, index: String, idCol: String,
             tsCol: String = "ts"): Unit = {
    val doc = to_json(struct(df.columns.toIndexedSeq.map(col): _*))
    val action = to_json(struct(struct(
      concat(lit(index + "_"), date_format(col(tsCol), "yyyyMMdd")).as("_index"),
      col(idCol).cast("string").as("_id")).as("index")))
    df.select(
        concat(lit(index + "_"), date_format(col(tsCol), "yyyyMMdd")).as("_index"),
        concat_ws("\n", action, doc).as("value"))
      .write.mode("overwrite").partitionBy("_index")
      .option("compression", "gzip").text(dir)
  }
}
