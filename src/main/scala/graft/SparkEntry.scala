package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7.1.
  *
  * `queries` is the complete operator inventory (SURVEY.md §2), one entry per
  * key; `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible key. Non-SQL-expressible operators (streaming, LSH,
  * multimodal) are covered by ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): the
    * reference's identity transform — sessionize raw events per user,
    * enrich with a broadcast lookup (the buildbot-normalization shape),
    * stamp etl lineage (upstream: activedata_etl/transforms/__init__.py). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    val lookup = Seq(
      ("error", "bad", 3), ("purchase", "money", 1), ("signup", "growth", 1),
      ("click", "engage", 0), ("view", "engage", 0))
      .toDF("event_type", "category", "severity")
    val sessions = Tables.events(spark, d)
      .groupBy("user_id", "event_type")
      .agg(
        min("ts").as("start_ts"), max("ts").as("end_ts"),
        count(lit(1)).as("n_events"), sum("value").as("total_value"))
    sessions.join(broadcast(lookup), Seq("event_type"), "left")
      .withColumn("duration_s",
        unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts")))
      .withColumn("etl", struct(
        monotonically_increasing_id().as("id"),
        lit("graft").as("source"),
        current_timestamp().as("timestamp")))
  }

  /** One entry per implemented operator key from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      sources.FormatScans.queries ++
      operators.Skew.queries ++
      operators.Expressions.queries ++
      operators.Aggregates.queries ++
      operators.Windows.queries ++
      etl.Transforms.queries ++
      llm.TextOps.queries ++
      llm.Dedup.queries ++
      llm.Pipeline.queries ++
      llm.Similarity.queries ++
      llm.Forget.queries ++
      llm.Multimodal.queries ++
      streaming.Streams.queries ++
      jx.JxQueries.queries

  /** DuckDB-equivalent ANSI SQL per SQL-expressible key (same column names
    * and ordering as the Spark result — driver hash-compares, SURVEY §7.4). */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      sources.FormatScans.oracle ++
      operators.Skew.oracle ++
      operators.Expressions.oracle ++
      operators.Aggregates.oracle ++
      operators.Windows.oracle ++
      etl.Transforms.oracle ++
      llm.TextOps.oracle ++
      llm.Dedup.oracle ++
      llm.Pipeline.oracle ++
      llm.Similarity.oracle ++
      llm.Forget.oracle ++
      llm.Multimodal.oracle ++
      streaming.Streams.oracle ++
      jx.JxQueries.oracle
}
