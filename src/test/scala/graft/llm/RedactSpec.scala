package graft.llm

import org.apache.spark.sql.functions._

/** Pins the PII-redaction family's behavioral contract beyond the DuckDB
  * hash gate: every PII class is actually found (counts never zero), no
  * raw PII survives redaction, and the hash-preserving pseudonyms are
  * stable (same input → same key) yet non-reversible prefixes. */
class RedactSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_redact finds every planted PII class and strips them all") {
    val out = graft.SparkEntry.queries("text_redact")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every doc carries exactly one planted email/phone and one URL
    assert(rows.forall(r => r.getAs[Int]("n_emails") >= 1), "email missed")
    assert(rows.forall(r => r.getAs[Int]("n_urls") >= 1), "url missed")
    assert(rows.forall(r => r.getAs[Int]("n_phones") >= 1), "phone missed")
  }

  test("redacted text contains markers and no surviving raw PII") {
    // recompute the redacted string (text_redact only exposes its md5)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pii = docs.withColumn("pii",
      concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"), lit("@example.com or "),
        lit("+1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" via https://host"), (col("doc_id") % 97).cast("string"),
        lit(".example.org/path?id="), (col("doc_id") * 7919).cast("string")))
    val red = pii.select(regexp_replace(regexp_replace(regexp_replace(col("pii"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
        "\\+1-555-[0-9]{4}", "<PHONE>").as("red"))
      .collect().map(_.getString(0))
    assert(red.forall(s => s.contains("<EMAIL>") && s.contains("<URL>")
      && s.contains("<PHONE>")))
    assert(red.forall(s => !s.contains("@example.com")
      && !s.contains("https://host") && !s.contains("+1-555-")))
  }

  test("hash-preserving pseudonyms are deterministic and 8 hex chars per match") {
    val a = graft.SparkEntry.queries("text_redact_hash")(spark, sf).collect()
    val b = graft.SparkEntry.queries("text_redact_hash")(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "keys not stable")
    val hex = "[0-9a-f]{8}(,[0-9a-f]{8})*".r
    assert(a.forall(r => hex.pattern.matcher(r.getAs[String]("email_keys")).matches()))
    assert(a.forall(r => hex.pattern.matcher(r.getAs[String]("phone_keys")).matches()))
  }
}
