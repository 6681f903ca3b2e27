package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Common._

/** T13b–T13e: right-to-be-FORGOTTEN propagation into the engine's own
  * STORED artifacts (upstream: the idempotent re-ETL contract of
  * activedata_etl/etl.py applied to derived indexes). `etl_forget` purges
  * a raw table and its derived aggregate; a real GDPR delete must also
  * reach the build-once/probe-many index stores this engine maintains —
  * otherwise the pair graph still holds the forgotten doc's shingles, the
  * IVF inverted lists its vectors, and the BM25 dictionary its term
  * partials. One tombstone rule across the family (doc_id % 37 == 0 — a
  * compliance feed in production), one forgotten-store build per base
  * store, and one gate discipline: **store-after-forget must hash-equal a
  * rebuild from the purged corpus** (the DuckDB oracle IS that rebuild).
  *
  * Deletion strategy is per-store, matching each store's algebra:
  *
  *  - **MinHash pair graph** (`minhash_pairs`): pairs are per-pair local
  *    (band keys and Jaccard of (a,b) never depend on other docs; the LSH
  *    band join carries no bucket cap), so deletion is an anti-join on
  *    either endpoint — EXACTLY the purged-corpus pair set. CC labels are
  *    recomputed only for AFFECTED components (those containing a
  *    tombstoned doc — removing a bridge doc can split its component and
  *    removing a component's min id renames it); unaffected components
  *    keep their stored labels verbatim. At 100 TB the delta touches
  *    |affected pairs| rows, not the corpus.
  *  - **IVF inverted lists** (`quantizer_16`): assignment rows are
  *    per-vector, so deletion is one anti-join on vec_id. The coarse
  *    quantizer (the MODEL) stays frozen — the documented store-the-model
  *    discipline; retraining is the separate `sim_quantizer_refresh`
  *    path — so "rebuild from purged corpus" means assigning the
  *    survivors through the same frozen centroids, which the oracle
  *    replays exactly (full-corpus training CTE + survivor filter).
  *  - **BM25 dictionary** (ST24 `df_store_stream`): df/cf sum across
  *    batches but max_tf/top_doc do NOT subtract, so the forget pass
  *    re-derives the per-batch partials of ONLY the batches that
  *    contained a tombstoned doc (the affected-batch set is computed from
  *    the tombstones) from the purged raw slice — the reference's
  *    "re-process the affected partition" contract — and copies every
  *    untouched batch partition verbatim. At 100 TB with date-partitioned
  *    batches the tombstones hit few partitions; cost is |affected
  *    batches|, not the corpus.
  *
  * Idempotence (a redelivered compliance feed must be a no-op) is by
  * construction — anti-joins of already-absent keys and re-derivation of
  * already-purged batches are fixpoints — and pinned by ForgetSpec, which
  * also pins store-after-forget == rebuild-from-purged inside Spark (the
  * driver oracle then re-proves it cross-engine at every gate SF).
  */
object Forget {

  /** The family-wide tombstone rule over any id column. */
  private def tombstoned(c: org.apache.spark.sql.Column) = c % 37 === 0

  // ——— T13b/T13c: MinHash pair graph + CC labels ———

  /** The pure delta: (surviving pairs, updated labels) from the stored
    * (pairs, labels) and a tombstone frame (one `doc_id` column). Public
    * to the spec so idempotence and rebuild-equality are pinned on the
    * FRAME algebra, not just the store wiring. */
  private[llm] def forgetPairFrames(pairs0: DataFrame, labels0: DataFrame,
      tomb: DataFrame): (DataFrame, DataFrame) = {
    val kept = pairs0
      .join(broadcast(tomb.select(col("doc_id").as("da"))), Seq("da"), "left_anti")
      .join(broadcast(tomb.select(col("doc_id").as("db"))), Seq("db"), "left_anti")
      .select("da", "db", "jaccard")
    // components holding a tombstoned doc: only these can change (a
    // removed doc can split its own component or take its min-id label
    // with it; no other component gains or loses an edge)
    val affectedLbls = labels0
      .join(broadcast(tomb.select(col("doc_id").as("id"))), Seq("id"))
      .select("lbl").distinct()
    val untouched = labels0
      .join(broadcast(affectedLbls), Seq("lbl"), "left_anti")
      .select("id", "lbl")
    val affPairs = kept
      .join(labels0.select(col("id").as("da"), col("lbl")), Seq("da"))
      .join(broadcast(affectedLbls), Seq("lbl"), "left_semi")
      .select("da", "db")
    (kept, untouched.unionByName(Dedup.clusterLabelsFrom(affPairs)))
  }

  private def forgottenPairStore(s: SparkSession, d: String): java.io.File =
    Artifacts.buildOnce(s, "minhash_pairs_forgotten", d) { dd =>
      val base = Dedup.pairStore(s, d)
      val tomb = t(s, d, "documents").select("doc_id")
        .filter(tombstoned(col("doc_id")))
      val (pairs, labels) = forgetPairFrames(
        s.read.parquet(s"$base/pairs"),
        s.read.parquet(s"$base/labels"), tomb)
      pairs.write.mode("overwrite").parquet(s"$dd/pairs")
      labels.write.mode("overwrite").parquet(s"$dd/labels")
    }

  private def pairsReadout(pairs: DataFrame): DataFrame =
    pairs.orderBy(desc("jaccard"), asc("da"), asc("db"))

  private def clustersReadout(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(array_sort(collect_list(col("id"))), _.cast("string")))
          .as("members"))
      .orderBy("cluster_id")

  val dedupForgetPairs: Q = (s, d) =>
    pairsReadout(s.read.parquet(s"${forgottenPairStore(s, d)}/pairs"))

  val dedupForgetClusters: Q = (s, d) =>
    clustersReadout(s.read.parquet(s"${forgottenPairStore(s, d)}/labels"))

  // ——— in-plan twins (jx corpus_op fallbacks): the same forget
  // semantics derived from the corpus frame when no store is available —
  // which IS the rebuild-from-purged the store gate pins equal ———

  private def forgetFramesOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val tomb = docs.select("doc_id").filter(tombstoned(col("doc_id")))
    val pairs = Dedup.minhashScoredPairsFrom(Dedup.shinglesOf(docs))
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"), r4(col("jaccard")).as("jaccard"))
    forgetPairFrames(pairs, Dedup.clusterLabelsFrom(pairs), tomb)
  }

  def forgetPairsOf(docs: DataFrame): DataFrame =
    pairsReadout(forgetFramesOf(docs)._1)

  def forgetClustersOf(docs: DataFrame): DataFrame =
    clustersReadout(forgetFramesOf(docs)._2)

  def forgetIvfOf(embs: DataFrame): DataFrame = {
    val (_, _, _, assign) = Similarity.ivfIndexOf(embs, 16)
    val tomb = embs.select("vec_id").filter(tombstoned(col("vec_id")))
    listsReadout(assign.join(broadcast(tomb), Seq("vec_id"), "left_anti"))
  }

  def forgetDictOf(docs: DataFrame): DataFrame =
    TextOps.invertedIndexOf(docs.filter(!tombstoned(col("doc_id"))))

  // ——— T13d: IVF inverted lists (frozen quantizer) ———

  private def forgottenIvfStore(s: SparkSession, d: String): java.io.File =
    Artifacts.buildOnce(s, "quantizer_16_forgotten", d) { dd =>
      val base = Similarity.quantizerStore(s, d, 16)
      val tomb = t(s, d, "embeddings").select("vec_id")
        .filter(tombstoned(col("vec_id")))
      s.read.parquet(s"$base/assign")
        .join(broadcast(tomb), Seq("vec_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$dd/assign")
    }

  /** Per-list readout after the forget: member count, key checksum, and
    * an order-free xor membership fingerprint (the ST10 recipe) — content
    * proof of WHICH vectors survived in each list. */
  private def listsReadout(assign: DataFrame): DataFrame =
    assign
      .withColumn("member_h",
        expr("CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        sum("vec_id").as("key_sum"),
        min("vec_id").as("min_vec"),
        max("vec_id").as("max_vec"),
        expr("bit_xor(member_h)").as("member_fp"))
      .orderBy("cid")

  val simForgetIvf: Q = (s, d) =>
    listsReadout(s.read.parquet(s"${forgottenIvfStore(s, d)}/assign"))

  // ——— T13g: multimodal payload pair graph ———

  /** The text pair-graph argument holds verbatim for the PAYLOAD pair
    * store (byte-shingle MinHash is the same per-pair-local chain over
    * the `(doc_id, h)` interface, no bucket cap), so forgetting is the
    * same two broadcast anti-joins. No label table in this store — the
    * mm family's clustering rides the text machinery downstream. */
  private def forgottenMmPairStore(s: SparkSession, d: String): java.io.File =
    Artifacts.buildOnce(s, "mm_pairs_forgotten", d) { dd =>
      val base = Multimodal.mmPairStore(s, d)
      val tomb = t(s, d, "documents").select("doc_id")
        .filter(tombstoned(col("doc_id")))
      s.read.parquet(s"$base/pairs")
        .join(broadcast(tomb.select(col("doc_id").as("da"))), Seq("da"), "left_anti")
        .join(broadcast(tomb.select(col("doc_id").as("db"))), Seq("db"), "left_anti")
        .select("da", "db", "jaccard")
        .write.mode("overwrite").parquet(s"$dd/pairs")
    }

  val mmForgetPairs: Q = (s, d) =>
    pairsReadout(s.read.parquet(s"${forgottenMmPairStore(s, d)}/pairs"))

  /** In-plan twin (jx `forget_knn` fallback): full rebuild over the
    * purged membership — by ForgetSpec's pin, exactly what the store's
    * re-rank delta equals. */
  def forgetKnnOf(embs: DataFrame): DataFrame = {
    val tomb = embs.select("vec_id").filter(tombstoned(col("vec_id")))
    val mem = Similarity.knnMembership(Similarity.ivfIndexOf(embs, 16), p = 3)
      .join(broadcast(tomb), Seq("vec_id"), "left_anti")
    Similarity.knnEdgesFromMem(mem, k = 3).orderBy("src", "rnk")
  }

  /** In-plan twin (jx `forget_payload` fallback). */
  def forgetPayloadPairsOf(docs: DataFrame): DataFrame = {
    val tomb = docs.select("doc_id").filter(tombstoned(col("doc_id")))
    pairsReadout(Multimodal.dedupPairsOf(docs)
      .join(broadcast(tomb.select(col("doc_id").as("da"))), Seq("da"), "left_anti")
      .join(broadcast(tomb.select(col("doc_id").as("db"))), Seq("db"), "left_anti")
      .select("da", "db", "jaccard"))
  }

  // ——— T13f: kNN-graph edges (the re-rank delta) ———

  /** Forgetting a vector from a kNN GRAPH is more than row deletion: a
    * surviving query whose top-k contained the deleted vector gets a
    * vacated slot — the (k+1)-th candidate enters. The exact delta:
    * drop tombstoned queries' rows; queries that LOST a neighbor (an
    * edge row with a tombstoned dst — by construction the stored rows
    * ARE the top-k, so losing one ⇔ rank shift) re-probe against the
    * purged membership; every other query's stored rows are already the
    * purged rebuild's rows verbatim (candidates only shrank below rank
    * k). Delta cost = |affected queries| × their probed lists, not the
    * corpus; the quantizer stays frozen (the model discipline). */
  private def forgottenKnnStore(s: SparkSession, d: String): java.io.File =
    Artifacts.buildOnce(s, "knn_graph_forgotten", d) { dd =>
      val base = Similarity.knnStore(s, d)
      val tomb = t(s, d, "embeddings").select("vec_id")
        .filter(tombstoned(col("vec_id")))
      val edges = s.read.parquet(s"$base/edges")
      val keptSrc = edges
        .join(broadcast(tomb.select(col("vec_id").as("src"))), Seq("src"), "left_anti")
      val affected = keptSrc
        .join(broadcast(tomb.select(col("vec_id").as("dst"))), Seq("dst"), "left_semi")
        .select("src").distinct()
      val untouched = keptSrc
        .join(broadcast(affected), Seq("src"), "left_anti")
        .select("src", "rnk", "dst", "cosine", "cid")
      val mem = Similarity.knnMembership(Similarity.ivfIndex(s, d, 16), p = 3)
        .join(broadcast(tomb), Seq("vec_id"), "left_anti")
      val reprobed = Similarity.knnEdgesFromMem(mem, k = 3,
        srcFilter = Some(affected))
      untouched.unionByName(reprobed)
        .write.mode("overwrite").parquet(s"$dd/edges")
    }

  val simForgetKnn: Q = (s, d) =>
    s.read.parquet(s"${forgottenKnnStore(s, d)}/edges").orderBy("src", "rnk")

  // ——— T13e: ST24 BM25 dictionary ———

  /** The T13e core over an ARBITRARY tombstone frame: affected batches
    * (by the store's own [[graft.streaming.Streams.dictBatches]] rule)
    * re-derive from the purged raw slice; untouched batch partitions copy
    * VERBATIM (partials round-trip parquet bit-exactly) — the re-ETL
    * contract. Returns the affected batch ids so ForgetSpec can pin the
    * delta as genuinely partial (|affected| < |batches|, untouched > 0)
    * with a single-batch tombstone set the %37 gate rule can't produce. */
  private[llm] def forgottenDictInto(s: SparkSession, docs: DataFrame,
      tomb: DataFrame, baseC: String, outC: String): Seq[Long] = {
    val nB = graft.streaming.Streams.dictBatches
    // which batches must re-process? derived from the tombstones via
    // the store's own batch rule — a bounded (≤ |batches|) driver list
    val affected: Seq[Long] = tomb
      .select(pmod(col("doc_id"), lit(nB)).as("batch_id")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    s.read.parquet(baseC)
      .filter(!col("batch_id").isin(affected: _*))
      .write.mode("overwrite").partitionBy("batch_id").parquet(outC)
    affected.foreach { bid =>
      graft.streaming.Streams.dfStoreSink(
        docs.filter(col("doc_id") % nB === bid)
          .join(broadcast(tomb.select("doc_id")), Seq("doc_id"), "left_anti"),
        bid, outC)
    }
    affected
  }

  private def forgottenDictStore(s: SparkSession, d: String): java.io.File =
    Artifacts.buildOnce(s, "df_store_forgotten", d) { dd =>
      val docs = t(s, d, "documents")
      val tomb = docs.select("doc_id").filter(tombstoned(col("doc_id")))
      forgottenDictInto(s, docs, tomb,
        s"${graft.streaming.Streams.dfStoreDir(s, d)}/c", s"$dd/c")
    }

  val textForgetDict: Q = (s, d) =>
    graft.streaming.Streams.dfStoreReadout(s, s"${forgottenDictStore(s, d)}/c")

  val queries: Map[String, Q] = Map(
    "dedup_forget_pairs" -> dedupForgetPairs,
    "dedup_forget_clusters" -> dedupForgetClusters,
    "sim_forget_ivf" -> simForgetIvf,
    "sim_forget_knn" -> simForgetKnn,
    "mm_forget_pairs" -> mmForgetPairs,
    "text_forget_dict" -> textForgetDict)

  /** The purged corpus as a CTE body — every oracle below is literally
    * "rebuild from this". */
  private val purgedDocs =
    "pdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0)"

  val oracle: Map[String, String] = Map(
    // the surviving pair graph must equal the purged corpus's pair graph
    "dedup_forget_pairs" ->
      s"""WITH $purgedDocs, ${Dedup.minhashCteFrom("pdocs")}
         SELECT da, db, round(cc * 1.0 / (na + nb - cc), 4) AS jaccard
         FROM mh WHERE cc * 1.0 / (na + nb - cc) >= 0.5
         ORDER BY jaccard DESC, da ASC, db ASC""",
    // the delta-relabeled components must equal recursive CC over the
    // purged pair graph (splits and min-id renames included)
    "dedup_forget_clusters" ->
      s"""WITH RECURSIVE $purgedDocs, ${Dedup.minhashCteFrom("pdocs")},
           pairs AS (SELECT da, db FROM mh WHERE cc * 1.0 / (na + nb - cc) >= 0.5),
           edges AS (SELECT da AS src, db AS dst FROM pairs
                     UNION ALL SELECT db, da FROM pairs),
           reach(id, lbl) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
           labels AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
         SELECT cluster_id, count(*) AS n_docs,
                array_to_string(list(CAST(id AS VARCHAR) ORDER BY id), ',') AS members
         FROM labels GROUP BY cluster_id ORDER BY cluster_id""",
    // the forgotten lists must equal assigning the SURVIVORS through the
    // frozen full-corpus quantizer (model retrain is sim_quantizer_refresh)
    "sim_forget_ivf" ->
      s"""WITH ${Similarity.ivfOracleCte}
         SELECT cid, count(*) AS n, CAST(sum(vec_id) AS BIGINT) AS key_sum,
                min(vec_id) AS min_vec, max(vec_id) AS max_vec,
                bit_xor(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                             AS BIGINT)) AS member_fp
         FROM assign WHERE vec_id % 37 <> 0
         GROUP BY cid ORDER BY cid""",
    // the surviving payload pair graph must equal the purged corpus's
    // byte-shingle pair graph (mm_dedup's chain over pdocs)
    "mm_forget_pairs" ->
      s"""WITH $purgedDocs, ${Dedup.minhashCteFromShingles(
             Multimodal.byteShCteFrom("pdocs"))}
         SELECT da, db, round(cc * 1.0 / (na + nb - cc), 4) AS jaccard
         FROM mh WHERE cc * 1.0 / (na + nb - cc) >= 0.5
         ORDER BY jaccard DESC, da ASC, db ASC""",
    // the re-rank delta must equal the kNN graph rebuilt over the purged
    // membership under the frozen quantizer (fmem filters BOTH join
    // sides; probe ranks are per-vector, unaffected by other vectors)
    "sim_forget_knn" ->
      s"""WITH ${Similarity.knnGraphOracleCte},
           fmem AS (SELECT * FROM mem WHERE vec_id % 37 <> 0),
           fcand AS (
             SELECT min(a.cid) AS cid, a.vec_id AS src, b.vec_id AS dst,
                    min(round(list_reduce([a.v[k] * b.v[k] for k in generate_series(1, 64)],
                                          (x, y) -> x + y)
                              / (sqrt(a.norm2) * sqrt(b.norm2)), 4)) + 0.0 AS cosine
             FROM fmem a JOIN fmem b ON a.cid = b.cid AND a.vec_id <> b.vec_id
             GROUP BY a.vec_id, b.vec_id),
           fg AS (SELECT cid, src, dst, cosine, rnk FROM (
               SELECT cid, src, dst, cosine,
                      CAST(row_number() OVER (PARTITION BY src
                                              ORDER BY cosine DESC, dst ASC) AS INT) AS rnk
               FROM fcand) WHERE rnk <= 3)
         SELECT src, rnk, dst, cosine, cid FROM fg ORDER BY src, rnk""",
    // the re-processed dictionary must equal the one-shot build over the
    // purged corpus
    "text_forget_dict" -> TextOps.invertedIndexOracleFrom(
      "(SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0) pd"))
}
