package graft.etl

import org.apache.spark.sql.functions._

/** Golden tests for the raw-log parsers over the FIXTURES.md §B sample
  * lines (reference-shaped mozlog / PERFHERDER / lcov inputs). */
class LogParsersSpec extends graft.SparkSpec {
  import spark.implicits._

  // FIXTURES.md §B1 — mozlog structured log lines.
  private val mozlogLines = Seq(
    """{"action":"suite_start","time":1470000000.000,"thread":"MainThread","source":"mochitest","tests":["dom/t1.html","dom/t2.html"]}""",
    """{"action":"test_start","time":1470000001.100,"test":"dom/t1.html","thread":"MainThread","source":"mochitest"}""",
    """{"action":"test_status","time":1470000001.500,"test":"dom/t1.html","subtest":"clicks work","status":"PASS","expected":"PASS","source":"mochitest"}""",
    """{"action":"test_status","time":1470000001.900,"test":"dom/t1.html","subtest":"focus works","status":"FAIL","expected":"PASS","message":"assertion failed","source":"mochitest"}""",
    """{"action":"test_end","time":1470000002.200,"test":"dom/t1.html","status":"OK","expected":"OK","source":"mochitest"}""",
    """{"action":"log","time":1470000002.300,"level":"INFO","message":"GECKO | plain log line"}""",
    """{"action":"crash","time":1470000003.000,"test":"dom/t2.html","signature":"libxul.so + 0x123","minidump_path":"/tmp/x.dmp","source":"mochitest"}""",
    """{"action":"suite_end","time":1470000004.000}""")

  test("T1: mozlog parse + sessionize matches the fixture golden") {
    val parsed = LogParsers.parseMozlog(mozlogLines.toDF("value"))
    assert(parsed.count() === 8)
    assert(parsed.filter(col("action").isNull).count() === 0)

    val sessions = LogParsers.sessionizeMozlog(parsed).orderBy("test").collect()
    assert(sessions.length === 2)

    val t1 = sessions(0)
    assert(t1.getAs[String]("test") === "dom/t1.html")
    assert(t1.getAs[Double]("start_time") === 1470000001.1)
    assert(t1.getAs[Double]("end_time") === 1470000002.2)
    assert(math.abs(t1.getAs[Double]("duration") - 1.1) < 1e-6)
    assert(t1.getAs[Long]("subtest_count") === 2L)
    assert(t1.getAs[Long]("fail_count") === 1L)
    assert(!t1.getAs[Boolean]("crash"))
    assert(!t1.getAs[Boolean]("ok"))
    assert(t1.getAs[String]("last_fail_message") === "assertion failed")

    val t2 = sessions(1)
    assert(t2.getAs[String]("test") === "dom/t2.html")
    assert(t2.getAs[Boolean]("crash"))
    assert(!t2.getAs[Boolean]("ok"))
    assert(t2.getAs[Long]("subtest_count") === 0L)
    assert(t2.isNullAt(t2.fieldIndex("start_time")))
  }

  test("T2: PERFHERDER_DATA extraction with replicate z-moment stats") {
    val line = """12:34:56 INFO - PERFHERDER_DATA: {"framework":{"name":"talos"},"suites":[{"name":"tp5","extraOptions":["e10s"],"subtests":[{"name":"page1","value":212.5,"replicates":[210.0,212.5,215.0],"unit":"ms","lowerIsBetter":true}],"value":212.5}]}"""
    val noise = "12:34:55 INFO - starting browser"
    val out = LogParsers.parsePerfherder(Seq(noise, line).toDF("value")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("framework") === "talos")
    assert(r.getAs[String]("suite") === "tp5")
    assert(r.getAs[String]("subtest") === "page1")
    assert(r.getAs[String]("unit") === "ms")
    assert(r.getAs[Boolean]("lower_is_better"))
    assert(r.getAs[Int]("n") === 3)
    assert(math.abs(r.getAs[Double]("mean") - 212.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance") - 12.5 / 3.0) < 1e-9)
    assert(r.getAs[Double]("min_r") === 210.0)
    assert(r.getAs[Double]("max_r") === 215.0)
  }

  test("T5: lcov records parse to covered/uncovered line arrays") {
    val lcov =
      """SF:dom/base/nsDocument.cpp
        |DA:100,1
        |DA:101,0
        |DA:102,7
        |end_of_record
        |SF:dom/base/nsRange.cpp
        |DA:10,0
        |DA:11,0
        |end_of_record
        |""".stripMargin
    val out = LogParsers.parseLcov(Seq(lcov).toDF("value"))
      .orderBy("source_file").collect()
    assert(out.length === 2)

    val doc = out.head
    assert(doc.getAs[String]("source_file") === "dom/base/nsDocument.cpp")
    assert(doc.getAs[Seq[Int]]("covered") === Seq(100, 102))
    assert(doc.getAs[Seq[Int]]("uncovered") === Seq(101))
    assert(doc.getAs[Double]("percent") === 0.6667)

    val rng = out(1)
    assert(rng.getAs[Seq[Int]]("covered") === Seq.empty)
    assert(rng.getAs[Seq[Int]]("uncovered") === Seq(10, 11))
    assert(rng.getAs[Double]("percent") === 0.0)
  }

  test("T3/T4: task block fans out artifacts and normalizes the task name") {
    // FIXTURES.md §B3
    val block = """{"status":{"taskId":"Abc123","state":"completed","runs":[{"runId":0,"started":"2024-01-01T00:00:00Z","resolved":"2024-01-01T00:10:00Z","workerType":"t-linux"}]},"task":{"provisionerId":"aws","metadata":{"name":"test-linux64/opt-mochitest-1"},"tags":{"os":"linux","test-type":"mochitest"},"artifacts":[{"name":"public/logs/live_backing.log"},{"name":"public/test_info/errorsummary.log"}]},"runId":0}"""
    val items = LogParsers.fanOutArtifacts(Seq(block).toDF("value"))
    val rows = items.orderBy("artifact").collect()
    assert(rows.length === 2) // one work item per artifact
    assert(rows.map(_.getAs[String]("artifact")).toSeq ===
      Seq("public/logs/live_backing.log", "public/test_info/errorsummary.log"))
    assert(rows.head.getAs[String]("task_id") === "Abc123")

    val norm = LogParsers.normalizeTaskNames(items).head()
    assert(norm.getAs[String]("platform") === "linux64")
    assert(norm.getAs[String]("build_type") === "opt")
    assert(norm.getAs[String]("suite") === "mochitest")
    assert(norm.getAs[Int]("chunk") === 1)
  }

  test("T7: dead-letter split routes malformed lines with the raw payload") {
    val lines = (mozlogLines :+ "this is not json").toDF("value")
    val parsed = LogParsers.parseMozlog(lines)
    val (ok, dead) = LogParsers.deadLetter(parsed, col("action").isNotNull)
    assert(ok.count() === 8)
    val d = dead.collect()
    assert(d.length === 1)
    assert(d.head.getAs[String]("raw") === "this is not json")
    assert(d.head.getAs[String]("error") === "parse_failed")
  }

  test("T8: JUnit XML reports explode into per-testcase rows") {
    import spark.implicits._
    val xml = Seq(
      """<testsuite name="auth" tests="2" failures="1" time="3.5">
        |  <testcase name="login_ok" classname="AuthSpec" time="1.2"/>
        |  <testcase name="login_bad" classname="AuthSpec" time="2.3">
        |    <failure message="expected 401">stacktrace here</failure>
        |  </testcase>
        |</testsuite>""".stripMargin,
      """<testsuite name="empty" tests="0" failures="0" time="0.0"></testsuite>""")
      .toDF("value")
    val out = LogParsers.parseJunitXml(xml).orderBy("suite", "test").collect()
    assert(out.length === 3) // 2 cases + the empty suite kept by explode_outer
    val bad = out.find(r => r.getAs[String]("test") == "login_bad").get
    assert(bad.getAs[String]("classname") === "AuthSpec")
    assert(bad.getAs[Boolean]("failed"))
    assert(bad.getAs[String]("failure_message") === "expected 401")
    assert(bad.getAs[Double]("duration_s") === 2.3)
    val ok = out.find(r => r.getAs[String]("test") == "login_ok").get
    assert(!ok.getAs[Boolean]("failed"))
    assert(ok.getAs[String]("failure_message") == null)
    val empty = out.find(r => r.getAs[String]("suite") == "empty").get
    assert(empty.getAs[String]("test") == null)
    assert(empty.getAs[Long]("suite_tests") === 0L)
  }

  test("S1/S3: file-backed readers round-trip the same parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-logs").toFile
    try {
      val f = new java.io.File(dir, "live_backing.log")
      val w = new java.io.PrintWriter(f)
      mozlogLines.foreach(w.println)
      w.close()
      val viaText = LogParsers.parseMozlog(
        LogParsers.readTextLog(spark, f.getAbsolutePath))
      assert(LogParsers.sessionizeMozlog(viaText).count() === 2)
      val viaJson = LogParsers.readJsonLines(
        spark, f.getAbsolutePath, LogParsers.mozlogSchema)
      assert(viaJson.filter(col("action") === "test_status").count() === 2)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
