package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import Common._
import graft.functions.JxFunctions._

/** The jx scalar expression language (SURVEY.md §2.2) exercised over the
  * driver tables. Upstream the reference evaluates an expression tree per
  * row in Python (jx_base/expressions/, jx_python/expressions.py); here
  * every op is a Catalyst built-in (or a `Column` composition from
  * [[graft.functions.JxFunctions]]), so the whole filter/projection stage
  * stays inside whole-stage codegen and pushes down to the parquet scan.
  */
object Expressions {

  /** E1: projection / rename / nested-leaves flatten (jx select with `a.*`).
    * A struct is built then re-expanded with `meta.*` — the Catalyst
    * optimizer collapses CreateStruct+GetStructField back to the raw
    * columns, so the parquet ReadSchema stays pruned to 4 columns. */
  val project: Q = (s, d) =>
    t(s, d, "orders")
      .select(
        col("o_orderkey").as("id"),
        struct(
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          col("o_orderpriority").as("priority")).as("meta"))
      .select(col("id"), col("meta.*"))
      .orderBy("id")
      .limit(100)

  /** E2/E4: and/or/not + comparisons, pushed to the scan. */
  val filterPred: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter((col("l_quantity") > 30.0 && col("l_discount") <= 0.05) ||
        !(col("l_returnflag") === "N"))
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(200)

  /** E3: null-safe equality (jx eq: missing == missing → true). */
  val filterNullsafeEq: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(jxEq(expr("nullif(l_returnflag, 'N')"), expr("nullif(l_linestatus, 'O')")))
      .agg(count(lit(1)).as("n_match"))

  /** E5: membership in a literal set. */
  val filterIn: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_returnflag").isin("A", "R") && col("l_linenumber").isin(1, 2, 3))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** E6: jx exists/missing — empty string counts as missing (upstream:
    * mo_dots treats "" as Null). */
  val filterExists: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("maybe",
        when(col("value") < 20.0, lit(""))
          .when(col("value") < 40.0, lit(null))
          .otherwise(col("event_type")))
      .filter(graft.functions.JxFunctions.exists(col("maybe")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  /** E7: prefix/suffix predicates. */
  val strPrefix: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy("lang")
      .agg(
        sum(when(col("text").startsWith("the "), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("source").endsWith("1"), 1L).otherwise(0L)).as("n_suf"))
      .orderBy("lang")

  /** E8: jx find — 0-based index, missing (not -1) when absent. */
  val strFind: Q = (s, d) =>
    t(s, d, "documents")
      .withColumn("idx", jxFind(col("text"), "spark"))
      .groupBy("lang")
      .agg(count(col("idx")).as("n_found"), sum(col("idx")).cast("long").as("sum_idx"))
      .orderBy("lang")

  /** E9: jx between {from,to} — substring between two markers, missing when
    * either is absent. Non-greedy regex keeps "first left marker, next right
    * marker" semantics identical in Spark (Java regex) and DuckDB (RE2). */
  val strBetween: Q = (s, d) =>
    t(s, d, "documents")
      .withColumn("btw", nullif(regexp_extract(col("text"), "merge (.*?) join", 1), lit("")))
      .groupBy("lang")
      .agg(count(col("btw")).as("n_btw"), min("btw").as("first_btw"))
      .orderBy("lang")

  /** E10/E11: clamped left/right slices + length. */
  val strSlice: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        substring(col("text"), 1, 10).as("l10"),
        expr("right(text, 5)").as("r5"),
        length(col("text")).as("len"))
      .orderBy("doc_id")
      .limit(100)

  /** E12/E13: separator concat skipping missing operands + case ops. */
  val strConcat: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        concat_ws(":",
          upper(col("lang")),
          expr("nullif(source, 'src0')"),
          col("n_chars").cast("string")).as("tag"),
        lower(trim(col("lang"))).as("lang_lc"))
      .orderBy("doc_id")
      .limit(100)

  /** E14: jx null-skipping arithmetic — add(1, null)=1, add(null,null)=null
    * (upstream: jx_base/expressions AddOp). */
  val arithNullskip: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("b", when(col("event_type") === "error", lit(null)).otherwise(col("value") * 0.1))
      .withColumn("c", when(col("value") < 50.0, lit(null)).otherwise(lit(1.0)))
      .withColumn("dd", when(col("value") < 50.0, lit(null)).otherwise(lit(2.0)))
      .withColumn("ab", jxAdd(col("value"), col("b")))
      .withColumn("cd", jxAdd(col("c"), col("dd")))
      .agg(
        r2(sum("ab")).as("sum_ab"),
        sum(when(col("cd").isNull, 1L).otherwise(0L)).as("n_cd_null"),
        r2(sum("cd")).as("sum_cd"))

  /** E15/E16: floor(x, modulo) — the histogram-bucket primitive — plus
    * greatest/least. */
  val arithFloor: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("bucket", jxFloor(col("value"), 50.0))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        r2(sum(greatest(col("value"), lit(100.0)))).as("sum_hi"),
        r2(sum(least(col("value"), lit(100.0)))).as("sum_lo"))
      .orderBy("bucket")

  /** E17: first non-missing. */
  val condCoalesce: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("v2", coalesce(when(col("value") > 100.0, lit(null)).otherwise(col("value")), lit(-1.0)))
      .groupBy("event_type")
      .agg(r2(sum("v2")).as("sum_v2"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** E18: case/when/else chain. */
  val condCase: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("category",
        when(col("event_type") === "error", "bad")
          .when(col("event_type") === "purchase", "money")
          .otherwise("other"))
      .groupBy("category")
      .agg(count(lit(1)).as("n"), r2(avg("value")).as("avg_value"))
      .orderBy("category")

  /** E19: coercions — epoch seconds (reference stores timestamps as unix
    * floats, upstream mo_times/dates.py), string↔number roundtrip, boolean. */
  val convCast: Q = (s, d) =>
    t(s, d, "events")
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("unix_s"),
        col("user_id").cast("string").cast("long").as("uid2"),
        (col("value") > 100.0).as("big"))
      .orderBy("event_id")
      .limit(200)

  /** E21: JSON property access on raw JSON-string columns (the reference's
    * documents are schemaless JSON; props mirrors that). */
  val jsonExtract: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"))
      .orderBy("k_bucket")

  /** E21b: parse-once JSON access — `from_json` into a typed struct, then
    * plain struct-field access. The 100 TB preference over
    * `get_json_object`: one parse per row feeding any number of field
    * reads, instead of one full re-parse per extracted field. */
  val jsonStruct: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("j", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy((col("j.k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("j.k").cast("long").as("sum_k"))
      .orderBy("k_bucket")

  /** E21c: VariantType access — Spark 4's native answer to schemaless
    * documents (SURVEY §1.2 maps unknown shapes to variant). `parse_json`
    * once into the binary variant encoding, then typed `variant_get`
    * path reads: no up-front schema (unlike from_json) and no string
    * re-parse per field (unlike get_json_object) — the right default for
    * the reference's open-shape documents at 100 TB. */
  val jsonVariant: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"))
      .orderBy("k_bucket")

  /** E22: calendar bucketing (jx time domains floor timestamps to calendar
    * units — upstream mo_times/dates.py Date.floor). */
  val dateTruncQ: Q = (s, d) =>
    t(s, d, "events")
      .withColumn("m", date_trunc("month", col("ts")))
      .groupBy("m", "event_type")
      .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
      .orderBy("m", "event_type")

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  val queries: Map[String, Q] = Map(
    "project" -> project,
    "filter_pred" -> filterPred,
    "filter_nullsafe_eq" -> filterNullsafeEq,
    "filter_in" -> filterIn,
    "filter_exists" -> filterExists,
    "str_prefix" -> strPrefix,
    "str_find" -> strFind,
    "str_between" -> strBetween,
    "str_slice" -> strSlice,
    "str_concat" -> strConcat,
    "arith_nullskip" -> arithNullskip,
    "arith_floor" -> arithFloor,
    "cond_coalesce" -> condCoalesce,
    "cond_case" -> condCase,
    "conv_cast" -> convCast,
    "json_extract" -> jsonExtract,
    "json_struct" -> jsonStruct,
    "json_variant" -> jsonVariant,
    "date_trunc_q" -> dateTruncQ)

  val oracle: Map[String, String] = Map(
    "project" ->
      """SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS price,
                o_orderpriority AS priority
         FROM orders ORDER BY id LIMIT 100""",
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE (l_quantity > 30.0 AND l_discount <= 0.05) OR NOT (l_returnflag = 'N')
         ORDER BY l_orderkey, l_linenumber LIMIT 200""",
    "filter_nullsafe_eq" ->
      """SELECT count(*) AS n_match FROM lineitem
         WHERE nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O')""",
    "filter_in" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_returnflag IN ('A', 'R') AND l_linenumber IN (1, 2, 3)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "filter_exists" ->
      """SELECT event_type, count(*) AS n
         FROM (SELECT event_type,
                      CASE WHEN value < 20.0 THEN ''
                           WHEN value < 40.0 THEN NULL
                           ELSE event_type END AS maybe
               FROM events)
         WHERE maybe IS NOT NULL AND maybe <> ''
         GROUP BY event_type ORDER BY event_type""",
    "str_prefix" ->
      """SELECT lang,
                CAST(count(*) FILTER (WHERE text LIKE 'the %') AS BIGINT) AS n_pre,
                CAST(count(*) FILTER (WHERE source LIKE '%1') AS BIGINT) AS n_suf
         FROM documents GROUP BY lang ORDER BY lang""",
    "str_find" ->
      """SELECT lang, count(idx) AS n_found, CAST(sum(idx) AS BIGINT) AS sum_idx
         FROM (SELECT lang, nullif(strpos(text, 'spark'), 0) - 1 AS idx FROM documents)
         GROUP BY lang ORDER BY lang""",
    "str_between" ->
      """SELECT lang, count(btw) AS n_btw, min(btw) AS first_btw
         FROM (SELECT lang, nullif(regexp_extract(text, 'merge (.*?) join', 1), '') AS btw
               FROM documents)
         GROUP BY lang ORDER BY lang""",
    "str_slice" ->
      """SELECT doc_id, left(text, 10) AS l10, right(text, 5) AS r5,
                CAST(length(text) AS INT) AS len
         FROM documents ORDER BY doc_id LIMIT 100""",
    "str_concat" ->
      """SELECT doc_id,
                concat_ws(':', upper(lang), nullif(source, 'src0'),
                          CAST(n_chars AS VARCHAR)) AS tag,
                lower(trim(lang)) AS lang_lc
         FROM documents ORDER BY doc_id LIMIT 100""",
    "arith_nullskip" ->
      """SELECT round(sum(ab), 2) + 0.0 AS sum_ab,
                CAST(count(*) FILTER (WHERE cd IS NULL) AS BIGINT) AS n_cd_null,
                round(sum(cd), 2) + 0.0 AS sum_cd
         FROM (SELECT CASE WHEN value IS NULL AND b IS NULL THEN NULL
                           ELSE coalesce(value, 0.0) + coalesce(b, 0.0) END AS ab,
                      CASE WHEN c IS NULL AND dd IS NULL THEN NULL
                           ELSE coalesce(c, 0.0) + coalesce(dd, 0.0) END AS cd
               FROM (SELECT value,
                            CASE WHEN event_type = 'error' THEN NULL ELSE value * 0.1 END AS b,
                            CASE WHEN value < 50.0 THEN NULL ELSE 1.0 END AS c,
                            CASE WHEN value < 50.0 THEN NULL ELSE 2.0 END AS dd
                     FROM events))""",
    "arith_floor" ->
      """SELECT floor(value / 50.0) * 50.0 AS bucket, count(*) AS n,
                round(sum(greatest(value, 100.0)), 2) AS sum_hi,
                round(sum(least(value, 100.0)), 2) AS sum_lo
         FROM events GROUP BY 1 ORDER BY 1""",
    "cond_coalesce" ->
      """SELECT event_type,
                round(sum(coalesce(CASE WHEN value > 100.0 THEN NULL ELSE value END, -1.0)), 2) + 0.0 AS sum_v2,
                count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "cond_case" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'bad'
                     WHEN event_type = 'purchase' THEN 'money'
                     ELSE 'other' END AS category,
                count(*) AS n, round(avg(value), 2) AS avg_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "conv_cast" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
                CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS uid2,
                value > 100.0 AS big
         FROM events ORDER BY event_id LIMIT 200""",
    "json_extract" ->
      """SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         GROUP BY 1 ORDER BY 1""",
    "json_struct" ->
      """SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         GROUP BY 1 ORDER BY 1""",
    "json_variant" ->
      """SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
         GROUP BY 1 ORDER BY 1""",
    "date_trunc_q" ->
      """SELECT date_trunc('month', ts) AS m, event_type, count(*) AS n,
                round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
}
