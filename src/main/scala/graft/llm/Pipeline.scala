package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Common._

/** The composed corpus-hygiene pipeline — the product the individual
  * operators exist for: raw documents → normalize → redact PII → drop
  * near-duplicates → drop benchmark-contaminated docs → pack the
  * survivors into fixed-size training chunks. One driver key proves the
  * stages COMPOSE (one plan, one shared shingle pass) rather than merely
  * passing in isolation.
  *
  * Scale shape, stage by stage:
  *  - clean + redact: in-row codegen'd regexp work in the scan stage —
  *    linear, no shuffle, survives any corpus size.
  *  - shingling: the one expensive pass. Computed ONCE over the hygienic
  *    text and materialized ([[DataFrame.localCheckpoint]] here; a
  *    parquet shingle table in a 100 TB deployment — same role as
  *    [[Similarity.ivfArtifacts]]), then SHARED by the MinHash band
  *    build, the exact-Jaccard verify, and the decontamination overlap —
  *    without it the composed plan would re-shingle the corpus three
  *    times. PlanAuditSpec pins that the final plan contains NO shingle
  *    recompute (no md5→conv chain outside the checkpoint).
  *  - near-dup drop list: banded MinHash LSH (never all-pairs) →
  *    iterative min-label connected components → anti-join. The
  *    anti-join streams; only the KB-scale drop list shuffles.
  *  - decontamination: benchmark shingle set is broadcast; one semi-pass
  *    over the corpus shingles.
  *  - packing: per-shard cumulative windows — no global order.
  *
  * The oracle replays every stage in DuckDB: the same regex chain, the
  * same md5 shingle space (via [[Dedup.minhashCteFrom]] pointed at the
  * cleaned CTE), recursive CC for the drop list, and the packing window —
  * then pins the packed layout AND the md5 of every surviving byte.
  */
object Pipeline {

  /** Whitespace/control runs collapsed to single spaces (same class as
    * TextOps.textClean). */
  private val WsRe = "[ \\t\\n\\r\\x01]+"

  /** Stages 1+2 as one in-row column: normalize then redact. On this
    * corpus both are no-ops byte-for-byte (the synthetic docs are already
    * clean) — the oracle REPLAYS the chain rather than assuming identity,
    * so the pin stays honest on any corpus. */
  private def hygienicText(text: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(
      trim(regexp_replace(text, WsRe, " ")),
      TextOps.EmailRe, "<EMAIL>"), TextOps.UrlRe, "<URL>"),
      TextOps.PhoneRe, "<PHONE>")

  /** The library surface: run the full hygiene chain over ANY corpus
    * frame against ANY benchmark frame (both (doc_id, text)). Returns the
    * packed survivor layout plus the md5 of each survivor's final bytes.
    * `benchIds` must not collide with corpus ids (they are held out by
    * id). */
  def corpusHygiene(corpus: DataFrame, bench: DataFrame,
      jaccardThreshold: Double = 0.5, minOverlap: Int = 3,
      ctx: Long = 2048L, nShards: Long = 8L): DataFrame = {
    val hygCorpus = corpus.select(col("doc_id"), hygienicText(col("text")).as("text"))
    val hygBench = bench.select(col("doc_id"), hygienicText(col("text")).as("text"))
    // the one shingle pass over corpus ∪ bench, materialized and shared
    // (see object doc); bench rows ride along so decontamination reuses it
    val sh = Dedup.shinglesOf(hygCorpus.unionByName(hygBench)).localCheckpoint()
    val benchIds = hygBench.select("doc_id")
    val corpusSh = sh.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
    val benchSh = sh.join(broadcast(benchIds), Seq("doc_id"), "left_semi")

    // near-dup drop list from banded-LSH pairs over the corpus shingles
    val dropIds = Dedup.clusterLabelsFrom(
        Dedup.minhashScoredPairsFrom(corpusSh)
          .filter(col("jaccard") >= jaccardThreshold))
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"))

    val contaminated = Dedup.decontaminateSh(corpusSh, benchSh, minOverlap)
      .select("doc_id")

    val survivors = hygCorpus
      .join(dropIds, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")

    TextOps.packChunks(survivors, ctx, nShards)
      .join(survivors.select(col("doc_id"), md5(col("text")).as("final_md5")),
        Seq("doc_id"))
      .select("doc_id", "shard", "n_tok", "chunk_id", "chunk_offset", "final_md5")
  }

  /** Driver gate: the documents table split into corpus (doc_id ≥ 10) and
    * benchmark (doc_id < 10) — a deterministic split the oracle rebuilds. */
  val pipelineCorpus: Q = (s, d) => {
    val docs = t(s, d, "documents")
    corpusHygiene(docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
      .orderBy("doc_id")
      .limit(300)
  }

  val queries: Map[String, Q] = Map("pipeline_corpus" -> pipelineCorpus)

  val oracle: Map[String, String] = Map(
    "pipeline_corpus" ->
      raw"""WITH RECURSIVE
           hyg AS (
             SELECT doc_id,
                    regexp_replace(regexp_replace(regexp_replace(
                      trim(regexp_replace(text, '[ \t\n\r\x01]+', ' ', 'g')),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                      'https?://[^ ]+', '<URL>', 'g'),
                      '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS text
             FROM documents),
           corp AS (SELECT doc_id, text FROM hyg WHERE doc_id >= 10),
           ${Dedup.minhashCteFrom("corp")},
           pairs AS (SELECT da, db FROM mh WHERE cc * 1.0 / (na + nb - cc) >= 0.5),
           edges AS (SELECT da AS src, db AS dst FROM pairs
                     UNION ALL SELECT db, da FROM pairs),
           reach(id, lbl) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
           droplist AS (SELECT id AS doc_id FROM (
             SELECT id, min(lbl) AS canonical FROM reach GROUP BY id)
             WHERE id <> canonical),
           btoks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM hyg WHERE doc_id < 10),
           bench AS (SELECT DISTINCT
                       CAST('0x' || substr(md5(unnest(
                         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          for i in generate_series(1, len(t) - 2)])), 1, 15)
                         AS BIGINT) AS h
                     FROM btoks WHERE len(t) >= 3),
           ov AS (SELECT sh.doc_id, count(*) AS n_overlap
                  FROM sh JOIN bench USING (h)
                  GROUP BY 1),
           contaminated AS (SELECT doc_id FROM ov WHERE n_overlap >= 3),
           survivors AS (
             SELECT doc_id, text FROM corp
             WHERE doc_id NOT IN (SELECT doc_id FROM droplist)
               AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
           base AS (SELECT doc_id, doc_id % 8 AS shard,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                    FROM survivors),
           packed AS (SELECT doc_id, shard, n_tok,
                             CAST(coalesce(sum(n_tok) OVER (
                               PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
                      FROM base)
         SELECT p.doc_id, p.shard, p.n_tok,
                CAST(p.cum_before // 2048 AS BIGINT) AS chunk_id,
                p.cum_before % 2048 AS chunk_offset,
                md5(s.text) AS final_md5
         FROM packed p JOIN survivors s USING (doc_id)
         ORDER BY p.doc_id LIMIT 300""")
}
