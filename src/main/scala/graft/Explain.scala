package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump: `runMain graft.Explain <sfDir> <key>[,key...]` prints
  * each key's final executed-plan string (the PLANS.md audit loop). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    args(1).split(",").foreach { key =>
      println(s"==== $key ====")
      println(SparkEntry.queries(key)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
