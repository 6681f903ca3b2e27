package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise). Config mirrors
  * Verify/Bench: UTC, small shuffle partitions, nanos-as-long for the
  * driver's TIMESTAMP(NANOS) events table. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FAIR scheduling so QueryServiceSpec's concurrent-request case runs
    // under the production scheduler shape (the service tags its handler
    // threads with a scheduler pool; under the default FIFO that tag is
    // inert). Sequential suites are unaffected.
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()
}
