package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-log parsers — the reference's identity (SURVEY.md §2.7 T1/T2/T5).
  *
  * Upstream the reference fetches artifacts over HTTP and parses them
  * row-at-a-time in Python (transforms/unittest_logs_to_sorted_table.py for
  * mozlog, perfherder_logs_to_perf_logs.py for PERFHERDER_DATA lines,
  * gcov_to_es.py for lcov). Here each parser is a declarative plan over a
  * raw-text DataFrame (`spark.read.text` / `readStream.text` shape: one
  * `value` column), so the same definition serves batch and streaming, and
  * Catalyst fuses parse → explode → aggregate into codegen'd stages.
  *
  * Scale notes: every parser is embarrassingly parallel over lines (mozlog,
  * perfherder) or over whole files (lcov — its SF:/DA: records are
  * order-dependent within a file, so the unit of parallelism is the file,
  * read with `wholetext`). Nothing here shuffles except the T1 sessionize
  * group-by on (source, test).
  *
  * Exercised by LogParsersSpec golden tests over the FIXTURES.md §B sample
  * lines; the oracle-gated `Transforms` queries run the same plan shapes
  * over the driver's parquet tables.
  */
object LogParsers {

  // ---------------------------------------------------------------- T1 mozlog

  /** mozlog structured-log line schema (FIXTURES.md §B1). `action`
    * discriminates: suite_start, test_start, test_status, test_end, log,
    * crash, process_output, suite_end. */
  val mozlogSchema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("time", DoubleType),
    StructField("thread", StringType),
    StructField("source", StringType),
    StructField("test", StringType),
    StructField("subtest", StringType),
    StructField("status", StringType),
    StructField("expected", StringType),
    StructField("message", StringType),
    StructField("level", StringType),
    StructField("signature", StringType),
    StructField("minidump_path", StringType),
    StructField("tests", ArrayType(StringType))))

  /** Parse raw mozlog JSON lines. Malformed lines yield a null struct →
    * null `action`; route them with [[deadLetter]] (`col("action").isNotNull`). */
  def parseMozlog(lines: DataFrame): DataFrame =
    lines
      .withColumn("j", from_json(col("value"), mozlogSchema))
      .select(col("j.*"), col("value").as("raw"))

  /** T1 core: per-(source, test) session from parsed mozlog events —
    * strictly a group-agg (one shuffle on the session key; no
    * order-dependent state): start/end from test_start/test_end times,
    * subtest and fail counts from test_status, crash flag, last failing
    * subtest message via a struct-max (max orders by time first). */
  def sessionizeMozlog(parsed: DataFrame): DataFrame = {
    val isStatus = col("action") === "test_status"
    val isFail   = isStatus && !(col("status") <=> col("expected"))
    parsed
      .filter(col("test").isNotNull)
      .groupBy("source", "test")
      .agg(
        min(when(col("action") === "test_start", col("time"))).as("start_time"),
        max(when(col("action") === "test_end", col("time"))).as("end_time"),
        sum(when(isStatus, 1L).otherwise(0L)).as("subtest_count"),
        sum(when(isFail, 1L).otherwise(0L)).as("fail_count"),
        max(when(col("action") === "crash", true).otherwise(false)).as("crash"),
        max(when(isFail, struct(col("time"), col("message")))).as("lf"))
      .withColumn("duration", col("end_time") - col("start_time"))
      .withColumn("ok", col("fail_count") === 0L && !col("crash"))
      .withColumn("last_fail_message", col("lf.message"))
      .drop("lf")
  }

  // ----------------------------------------------------------- T2 perfherder

  /** PERFHERDER_DATA payload schema (FIXTURES.md §B2 — the public
    * Treeherder format). */
  val perfherderSchema: StructType = StructType(Seq(
    StructField("framework", StructType(Seq(StructField("name", StringType)))),
    StructField("suites", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", DoubleType),
      StructField("extraOptions", ArrayType(StringType)),
      StructField("subtests", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("value", DoubleType),
        StructField("replicates", ArrayType(DoubleType)),
        StructField("unit", StringType),
        StructField("lowerIsBetter", BooleanType)))))))))))

  /** T2: scan raw log lines for the `PERFHERDER_DATA:` marker, parse the
    * JSON payload, explode suites → subtests, and derive z-moment stats
    * over each subtest's replicates with higher-order functions (n, Σx,
    * Σx² → mean/var — mo_math/stats.py ZeroMoment semantics, no UDFs).
    * The contains() pre-filter prunes non-marker lines before the (costly)
    * JSON parse, and pushes down to the text scan. */
  def parsePerfherder(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").contains("PERFHERDER_DATA: "))
      .withColumn("payload", regexp_extract(col("value"), "PERFHERDER_DATA: (.*)", 1))
      .withColumn("p", from_json(col("payload"), perfherderSchema))
      .select(col("p.framework.name").as("framework"), explode(col("p.suites")).as("suite"))
      .select(col("framework"), col("suite.name").as("suite"),
        explode(col("suite.subtests")).as("st"))
      .select(
        col("framework"), col("suite"),
        col("st.name").as("subtest"), col("st.unit").as("unit"),
        col("st.lowerIsBetter").as("lower_is_better"),
        col("st.value").as("value"), col("st.replicates").as("replicates"))
      .withColumn("n", size(col("replicates")))
      .withColumn("s1", expr(
        "aggregate(replicates, CAST(0 AS DOUBLE), (a, x) -> a + x)"))
      .withColumn("s2", expr(
        "aggregate(replicates, CAST(0 AS DOUBLE), (a, x) -> a + x * x)"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance", col("s2") / col("n") - col("mean") * col("mean"))
      .withColumn("min_r", array_min(col("replicates")))
      .withColumn("max_r", array_max(col("replicates")))

  // ----------------------------------------------------------------- T5 lcov

  /** T5: lcov/grcov coverage text → per-file coverage docs. lcov records
    * are order-dependent WITHIN a file (`SF:` names the file, `DA:ln,hits`
    * lines follow, `end_of_record` closes), so the parse unit is the whole
    * file string (`spark.read.option("wholetext", true).text`): split into
    * records, then every record parses independently — order inside a
    * record is recovered by regexp_extract_all, not by row order, so the
    * operator stays embarrassingly parallel across files/records. */
  def parseLcov(files: DataFrame): DataFrame =
    files
      .select(explode(split(col("value"), "end_of_record")).as("rec"))
      .withColumn("source_file", regexp_extract(col("rec"), "SF:([^\\n]+)", 1))
      .filter(length(col("source_file")) > 0)
      .withColumn("da", expr(
        """transform(regexp_extract_all(rec, 'DA:(\\d+),(\\d+)', 0),
             m -> struct(CAST(split(substr(m, 4), ',')[0] AS INT) AS line,
                         CAST(split(substr(m, 4), ',')[1] AS INT) AS hits))"""))
      .select(
        col("source_file"),
        array_sort(expr("transform(filter(da, x -> x.hits > 0), x -> x.line)"))
          .as("covered"),
        array_sort(expr("transform(filter(da, x -> x.hits = 0), x -> x.line)"))
          .as("uncovered"))
      .withColumn("percent",
        round(size(col("covered")) /
          (size(col("covered")) + size(col("uncovered"))).cast("double"), 4))

  // ------------------------------------------------------ T3/T4 task blocks

  /** Task/pulse block schema (FIXTURES.md §B3 — the public Taskcluster
    * message shape the reference's pulse transforms consume). */
  val taskBlockSchema: StructType = StructType(Seq(
    StructField("status", StructType(Seq(
      StructField("taskId", StringType),
      StructField("state", StringType),
      StructField("runs", ArrayType(StructType(Seq(
        StructField("runId", LongType),
        StructField("started", StringType),
        StructField("resolved", StringType),
        StructField("workerType", StringType)))))))),
    StructField("task", StructType(Seq(
      StructField("provisionerId", StringType),
      StructField("metadata", StructType(Seq(StructField("name", StringType)))),
      StructField("tags", MapType(StringType, StringType)),
      StructField("artifacts", ArrayType(StructType(Seq(
        StructField("name", StringType)))))))),
    StructField("runId", LongType)))

  /** T4: pulse/task fan-out — one message row → one work item per artifact
    * (upstream: transforms/pulse_block_to_unittest_logs.py). `explode` is
    * the whole generator; everything else rides along columnar. */
  def fanOutArtifacts(blocks: DataFrame): DataFrame =
    blocks
      .withColumn("j", from_json(col("value"), taskBlockSchema))
      .select(
        col("j.status.taskId").as("task_id"),
        col("j.runId").as("run_id"),
        col("j.task.metadata.name").as("task_name"),
        explode(col("j.task.artifacts.name")).as("artifact"))

  /** T3: builder/task-name normalization (upstream: imports/buildbot.py —
    * a ~2000-line name → {platform, type, suite, chunk} mapping). The
    * patterned parse comes from the name itself; the residual lookup rides
    * a broadcast map exactly like Transforms.etlNormalize. Name shape:
    * "test-<platform>/<type>-<suite>-<chunk>". */
  def normalizeTaskNames(tasks: DataFrame): DataFrame =
    tasks
      .withColumn("platform",
        regexp_extract(col("task_name"), "^[a-z]+-([a-z0-9]+)/", 1))
      .withColumn("build_type",
        regexp_extract(col("task_name"), "/([a-z]+)-", 1))
      .withColumn("suite",
        regexp_extract(col("task_name"), "/[a-z]+-([a-z]+)", 1))
      .withColumn("chunk",
        when(regexp_extract(col("task_name"), "-([0-9]+)$", 1) === "", lit(null))
          .otherwise(regexp_extract(col("task_name"), "-([0-9]+)$", 1).cast("int")))

  // ---------------------------------------------------------- T7 dead-letter

  /** T7: dead-letter routing (upstream: etl.py catches per-key transform
    * failures and re-queues to an error bucket). Declarative split: one
    * predicate, two filtered branches — Catalyst shares the scan; the dead
    * branch carries the raw input plus an error tag for re-processing.
    * Null predicate (e.g. parse returned null) routes to dead. */
  def deadLetter(df: DataFrame, isOk: Column, error: String = "parse_failed")
      : (DataFrame, DataFrame) = {
    val ok   = df.filter(coalesce(isOk, lit(false)))
    val dead = df.filter(!coalesce(isOk, lit(false)))
      .withColumn("error", lit(error))
    (ok, dead)
  }

  // ------------------------------------------------------ T8 junit xml

  /** JUnit XML report schema: testsuite attributes (XML attributes carry
    * the default "_" prefix) plus the testcase array, each case with an
    * optional failure element. */
  val junitSchema: StructType = StructType(Seq(
    StructField("_name", StringType),
    StructField("_tests", LongType),
    StructField("_failures", LongType),
    StructField("_time", DoubleType),
    StructField("testcase", ArrayType(StructType(Seq(
      StructField("_name", StringType),
      StructField("_classname", StringType),
      StructField("_time", DoubleType),
      StructField("failure", StructType(Seq(
        StructField("_message", StringType),
        StructField("_VALUE", StringType))))))))))

  /** T8: JUnit XML test-report ingestion — the industry-generic sibling
    * of the mozlog parser (same ETL shape: one report per row in, one
    * row per testcase out). `from_xml` (Spark 4) parses in-plan — no
    * per-file XML library loop, the same declared-schema discipline as
    * [[readJsonLines]] — then the testcase array explodes into the
    * denormalized per-test table the reference builds from its own log
    * formats. `explode_outer` keeps empty suites visible. */
  def parseJunitXml(df: DataFrame, xmlCol: String = "value"): DataFrame =
    df
      .withColumn("r", from_xml(col(xmlCol), junitSchema))
      .select(
        col("r._name").as("suite"),
        col("r._tests").as("suite_tests"),
        col("r._failures").as("suite_failures"),
        explode_outer(col("r.testcase")).as("tc"))
      .select(
        col("suite"), col("suite_tests"), col("suite_failures"),
        col("tc._classname").as("classname"),
        col("tc._name").as("test"),
        col("tc._time").as("duration_s"),
        col("tc.failure").isNotNull.as("failed"),
        col("tc.failure._message").as("failure_message"))

  // ------------------------------------------------------- source shorthands

  /** S3: raw text log scan (upstream: imports/text_log.py iterated HTTP
    * bodies; here the artifact store is a path and Spark parallelizes over
    * files/splits). */
  def readTextLog(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S1: JSON-lines scan with declared schema (upstream: s3.py read gz
    * JSON-lines by key prefix; Spark handles gz natively and an explicit
    * schema skips the inference pass — mandatory at 100 TB). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** lcov reader: whole-file strings so record order survives (see
    * [[parseLcov]]). */
  def readLcov(spark: SparkSession, path: String): DataFrame =
    parseLcov(spark.read.option("wholetext", "true").text(path))
}
