// Dump .explain("formatted") for a comma-separated key list to plans/<outdir>/.
// Usage: spark-shell --driver-class-path target/scala-2.13/classes \
//   -I tools/dump_plans.scala  with env: PLAN_KEYS, PLAN_SUFFIX (_before/_after),
//   PLAN_DIR (default plans/r19), PLAN_SF (default /root/testdata/sf0.1)
val keys = sys.env("PLAN_KEYS").split(",").toSeq
val suffix = sys.env.getOrElse("PLAN_SUFFIX", "_before")
val dir = sys.env.getOrElse("PLAN_DIR", "plans/r19")
val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
new java.io.File(dir).mkdirs()
keys.foreach { k =>
  val df = graft.SparkEntry.queries(k)(spark, sf)
  val txt = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  java.nio.file.Files.writeString(
    java.nio.file.Paths.get(s"$dir/$k$suffix.txt"), txt)
  val nEx = "Exchange".r.findAllIn(txt).size
  val nScan = "Scan parquet".r.findAllIn(txt).size
  println(s"PLAN_DUMPED $k$suffix exchanges=$nEx scans=$nScan chars=${txt.length}")
}
sys.exit(0)
