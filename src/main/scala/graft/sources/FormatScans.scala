package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Common._

/** S1/S3 format surface, oracle-gated: CSV, JSON-lines, and ORC
  * ROUND-TRIPS (upstream: the reference's ETL ingests raw JSON-lines
  * logs — activedata_etl/transforms/unittest_logs.py — and republishes
  * typed rows; here each format's writer AND reader run inside the gated
  * plan). The orders table is written once per (session, dataset) into
  * the artifact store in each format ([[graft.llm.Artifacts.buildOnce]]),
  * read back through Spark's real format readers with EXPLICIT schemas
  * (no inference nondeterminism), and compared against the DuckDB oracle
  * reading the ORIGINAL parquet — so a format that drops precision,
  * mangles a date, or re-types a column fails the hash gate.
  *
  * Fidelity policy: CSV and JSON are TEXT formats, so their keys carry
  * the text-exact projection (integers, strings, ISO dates — columns
  * with one canonical rendering); ORC is a binary columnar format, so
  * its key round-trips the full row INCLUDING the raw double and the
  * timestamp. At 100 TB all three readers are splittable scans
  * (CSV/JSON by line, ORC by stripe) — the read parallelizes across
  * executors exactly like the parquet path.
  */
object FormatScans {

  private val textSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_orderpriority", StringType),
    StructField("o_day", DateType)))

  /** The text-exact projection written for the CSV/JSONL trips. */
  private def textProj(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), col("o_orderdate").cast("date").as("o_day"))

  /** One artifact dir carrying all three format dumps. */
  private def fmtDir(s: SparkSession, d: String): String =
    graft.llm.Artifacts.buildOnce(s, "fmt_roundtrip", d) { dd =>
      textProj(s, d).write.option("header", "true")
        .csv(s"$dd/orders_csv")
      textProj(s, d).write.json(s"$dd/orders_jsonl")
      t(s, d, "orders").write.orc(s"$dd/orders_orc")
    }.toString

  private def tail(df: DataFrame): DataFrame =
    df.orderBy("o_orderkey").limit(300)

  /** S3' gate: CSV write → CSV read (explicit schema, header). */
  val scanCsv: Q = (s, d) =>
    tail(s.read.schema(textSchema).option("header", "true")
      .csv(s"${fmtDir(s, d)}/orders_csv"))

  /** S1' gate: JSON-lines write → JSON-lines read — the reference's
    * native log format, through Spark's real splittable json source. */
  val scanJsonl: Q = (s, d) =>
    tail(s.read.schema(textSchema).json(s"${fmtDir(s, d)}/orders_jsonl"))

  /** S2' gate: ORC write → ORC read, full fidelity (raw double +
    * timestamp round-trip bit-exactly through the binary format). */
  val scanOrc: Q = (s, d) =>
    tail(s.read.orc(s"${fmtDir(s, d)}/orders_orc")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  val queries: Map[String, Q] = Map(
    "scan_csv" -> scanCsv,
    "scan_jsonl" -> scanJsonl,
    "scan_orc" -> scanOrc)

  private val textOracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
              CAST(o_orderdate AS DATE) AS o_day
       FROM orders ORDER BY o_orderkey LIMIT 300"""

  val oracle: Map[String, String] = Map(
    "scan_csv" -> textOracle,
    "scan_jsonl" -> textOracle,
    "scan_orc" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey LIMIT 300""")
}
