package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Common._

/** Structured Streaming twins of the batch pipeline (SURVEY.md §2.8).
  *
  * The reference's "streaming" is SQS work queues with at-least-once key
  * delivery and idempotent re-ETL (upstream: pyLibrary/aws/__init__.py,
  * activedata_etl/etl.py). The Spark-native upgrade: event-time windows +
  * watermarks for lateness (the reference re-processes whole keys instead),
  * checkpointed sources for at-least-once, and idempotent foreachBatch
  * sinks keyed on the etl lineage key for effectively-exactly-once.
  *
  * These builders take a streaming (or batch) DataFrame so ScalaTest can
  * drive them with MemoryStream; `stream_tumbling` in the query map runs
  * the identical plan in batch mode (same `window()` expression) for the
  * DuckDB oracle — one definition, two execution modes, which is exactly
  * Structured Streaming's contract.
  */
object Streams {

  /** ST2: tumbling event-time window aggregation. */
  def tumblingCounts(events: DataFrame, width: String = "6 hours"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** ST2+ST4: the streaming form — watermarked so state is bounded. */
  def tumblingCountsStream(events: DataFrame, width: String = "6 hours",
      lateness: String = "1 hour"): DataFrame =
    tumblingCounts(events.withWatermark("ts", lateness), width)

  /** ST3: session windows by inactivity gap (the T1 sessionizer's streaming
    * twin for per-user activity). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r2(sum("value")).as("total_value"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Typed event for the stateful sessionizer. */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

  /** Emitted session. */
  case class Session(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Long, n_errors: Long, ok: Boolean)

  /** Sessionizer state (public: the state Encoder's generated code must be
    * able to reach the accessors). */
  case class SessState(start: Long, end: Long, n: Long, errs: Long)

  private def sessOf(uid: Long, st: SessState): Session =
    Session(uid, new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end),
      st.n, st.errs, st.errs == 0)

  /** ST3 (custom state): flatMapGroupsWithState sessionizer — the general
    * form when session semantics exceed session_window (e.g. the mozlog
    * suite_start/test_end state machine, upstream
    * transforms/unittest_logs_to_sorted_table.py).
    *
    * Closed sessions (event gap > gapMs) emit immediately; the OPEN tail
    * session is held in state and flushed when the key sees no data for
    * `idleTimeout` of processing time (`setTimeoutDuration` +
    * `hasTimedOut`) — without the timeout path a key's final session
    * would never be emitted. [[sessionizeEventTime]] is the event-time
    * twin: its tail flush rides the watermark instead of wall clock. */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L,
      idleTimeout: String = "2 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // Idle key: flush the open tail session and clear state.
            val tail = state.getOption.map(st => sessOf(uid, st))
            state.remove()
            tail.iterator
          } else {
            // Per-key per-micro-batch group: bounded by the batch size.
            // Sorting buffers it — fine for log-shaped groups; a 100 TB
            // pipeline would pre-bucket keys by (key, hour) to bound this.
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            if (sorted.isEmpty) Iterator.empty
            else {
              var cur = state.getOption.getOrElse {
                val h = sorted.head
                SessState(h.ts.getTime, h.ts.getTime, 0L, 0L)
              }
              val out = Seq.newBuilder[Session]
              sorted.foreach { e =>
                val t = e.ts.getTime
                if (t - cur.end > gapMs && cur.n > 0) {
                  out += sessOf(uid, cur)
                  cur = SessState(t, t, 0L, 0L)
                }
                cur = SessState(math.min(cur.start, t), math.max(cur.end, t),
                  cur.n + 1, cur.errs + (if (e.event_type == "error") 1L else 0L))
              }
              state.update(cur)
              state.setTimeoutDuration(idleTimeout)
              out.result().iterator
            }
          }
      }
  }

  /** ST3 (custom state, event-time): the production replay form of
    * [[sessionize]] — the open tail session is flushed when the WATERMARK
    * passes its gap end, not after a processing-time idle interval. Over
    * event-time-ordered replay this gives deterministic output: a
    * re-run of the same input stream closes the same sessions at the
    * same event-time points regardless of wall-clock scheduling, which
    * the processing-time form cannot promise. Same gap-split logic, same
    * emitted Session rows; only the tail-flush trigger differs
    * (`setTimeoutTimestamp` against the watermark vs
    * `setTimeoutDuration`). The timeout is clamped to just above the
    * current watermark because Spark rejects timer timestamps at or
    * behind it (a group whose gap end is already past the watermark
    * flushes at the next watermark advance). */
  def sessionizeEventTime(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L,
      lateness: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val tail = state.getOption.map(st => sessOf(uid, st))
            state.remove()
            tail.iterator
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            if (sorted.isEmpty) Iterator.empty
            else {
              var cur = state.getOption.getOrElse {
                val h = sorted.head
                SessState(h.ts.getTime, h.ts.getTime, 0L, 0L)
              }
              val out = Seq.newBuilder[Session]
              sorted.foreach { e =>
                val t = e.ts.getTime
                if (t - cur.end > gapMs && cur.n > 0) {
                  out += sessOf(uid, cur)
                  cur = SessState(t, t, 0L, 0L)
                }
                cur = SessState(math.min(cur.start, t), math.max(cur.end, t),
                  cur.n + 1, cur.errs + (if (e.event_type == "error") 1L else 0L))
              }
              state.update(cur)
              state.setTimeoutTimestamp(
                math.max(cur.end + gapMs, state.getCurrentWatermarkMs() + 1))
              out.result().iterator
            }
          }
      }
  }

  /** ST6: streaming exact dedup — the in-flight form of the reference's
    * idempotent etl keys: a re-delivered record (at-least-once sources
    * redeliver on retry) is dropped by key BEFORE it reaches any sink,
    * instead of each sink deduplicating on write.
    * `dropDuplicatesWithinWatermark` bounds the key state by the
    * watermark — state for a key is dropped once the watermark passes
    * it, so memory is O(keys-per-lateness-window), not O(all keys ever):
    * the property that makes streaming dedup viable on an unbounded
    * 100 TB/day stream. Redeliveries later than the watermark fall
    * through to the idempotent SINK ([[idempotentAppend]]) — the two
    * layers compose into the end-to-end exactly-once story. */
  def dedupStream(events: DataFrame, keys: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keys)

  /** ST5: idempotent sink — per micro-batch, dedup on the lineage key,
    * then OVERWRITE the batch's own partition (dynamic partition
    * overwrite): a re-delivered batch id rewrites exactly its partition
    * instead of appending duplicates — the reference's etl-key overwrite
    * semantics (upstream sinks/s3_bucket.py: one S3 object per etl key,
    * re-ETL replaces it). Effectively-exactly-once on top of the
    * checkpoint's at-least-once redelivery. */
  def idempotentAppend(batch: DataFrame, batchId: Long, dir: String, keyCols: Seq[String]): Unit =
    batch
      .dropDuplicates(keyCols)
      .withColumn("batch_id", lit(batchId))
      // writer-scoped option, NOT session conf: a session-level dynamic
      // mode would silently change overwrite semantics for every later
      // partitioned write on the shared session
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** ST8: the streaming MAINTAINER of the daily sketch rollup behind the
    * dashboard ([[graft.operators.Aggregates.sketchDashboardFrame]]): per
    * micro-batch, fold the batch's events into per-(day, event_type)
    * PARTIAL sketches and write them under the batch's own
    * (day, batch_id) partitions — dynamic partition overwrite, so a
    * REDELIVERED batch replaces exactly its own partials instead of
    * double-counting (the same effectively-exactly-once recipe as
    * [[idempotentAppend]]). The store accretes one partial row per
    * (day, event_type, batch); reads stay day-pruned, and because the
    * partials are mergeable the dashboard merge is exact over ANY number
    * of rows per day — the writer never compacts or rewrites history,
    * and a late event simply adds another partial to its event-time day.
    * At 100 TB this is the production shape: a continuously-running job
    * keeps KB-scale dashboard state fresh without ever re-scanning raw
    * events. */
  def sketchStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.operators.Aggregates.sketchPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day", "batch_id").parquet(dir)

  /** ST9 (forward idea s): stream-maintained SHARD-MANIFEST store — the
    * export twin of [[sketchStoreSink]]. Each micro-batch writes its own
    * partial manifest under `batch_id=…`; partials obey
    * [[graft.llm.TextOps.mergeManifests]]' distributive algebra
    * (sums / min / max / xor), so the merged readout is exact over any
    * number of partials, and a redelivered batch id overwrites only its
    * own partition (dynamic partition overwrite: at-least-once delivery
    * → exactly-once manifest). A continuously-ingesting exporter keeps
    * the trainer-facing manifest fresh without ever re-reading old
    * shards. */
  def manifestStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.shardManifest(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** ST21: stream-maintained PACKING-manifest store — the batch-assembly
    * twin of [[manifestStoreSink]]: a continuously-ingesting exporter
    * keeps the trainer-facing chunk geometry fresh without re-reading
    * packed shards. Each micro-batch writes per-packing-shard partials
    * ([[graft.llm.TextOps.packPartialsOf]]: doc/token sums + xor
    * fingerprint, all distributive) under its own batch partition
    * (dynamic idempotent overwrite); the readout
    * ([[graft.llm.TextOps.packMergeFrom]]) re-derives n_chunks/last_fill
    * from the merged totals — exact, because gap-free concat packing
    * pins n_chunks to ceil(n_tokens/ctx). */
  def packStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.packPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** ST21 batch twin / driver gate: two deterministic micro-batches
    * (doc_id parity split) sunk through [[packStoreSink]], batch 0
    * REDELIVERED to prove the idempotent overwrite, then the merged
    * readout — gated by `text_pack_manifest`'s oracle VERBATIM (the
    * maintained store must be indistinguishable from packing the whole
    * corpus in one shot). */
  val streamPackStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "pack_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val p = s"$dd/p"
      packStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, p)
      packStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, p)
      // at-least-once redelivery of batch 0: must overwrite, not append
      packStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, p)
    }
    graft.llm.TextOps.packMergeFrom(s.read.parquet(s"$dir/p"))
  }

  /** ST21b: the INTERLEAVED twin of [[packStoreSink]] — the same store
    * layout and merge algebra over the multimodal token cost
    * ([[graft.llm.Multimodal.mmPackPartialsOf]]), so one maintenance
    * recipe serves text-only and interleaved exporters. */
  def mmPackStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.Multimodal.mmPackPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** ST21b batch twin / driver gate: gated by `mm_pack_manifest`'s
    * coordinate-derived oracle VERBATIM. */
  val streamMmPackStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "mm_pack_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val p = s"$dd/p"
      mmPackStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, p)
      mmPackStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, p)
      // at-least-once redelivery of batch 0: must overwrite, not append
      mmPackStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, p)
    }
    graft.llm.TextOps.packMergeFrom(s.read.parquet(s"$dir/p"))
  }

  /** ST11: stream-maintained per-source QUALITY monitor store — the
    * ingest-health companion to the manifest store: a continuously
    * ingesting pipeline needs "did source X's quality just crater?"
    * answerable WITHOUT re-scanning the corpus. Each micro-batch folds
    * its docs into per-source partials
    * ([[graft.llm.TextOps.qualityPartialsOf]]: sums / min / max plus a
    * DECIMAL quality sum, all distributive) written under the batch's
    * own partition — dynamic partition overwrite, so a redelivered batch
    * replaces exactly itself ([[idempotentAppend]]'s recipe). The
    * readout re-merges |sources|×|batches| KB-scale rows; at 100 TB/day
    * the monitor's refresh cost is independent of corpus size. */
  def qualityStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.qualityPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** ST15: stream-maintained CLASSIFIER pass-rate monitor — the quality
    * monitor's decision-level twin: "what fraction of each source is the
    * release gate keeping, and is that drifting?" answered per batch
    * against the STORED NB model ([[graft.llm.TextOps.nbModelStored]] —
    * training is a separate periodic job; the stream only probes). Each
    * micro-batch scores ITSELF (per-doc score is batch-local: one
    * broadcast hash join + a per-doc mean) and writes per-source
    * partials — doc/pass counts plus a DECIMAL score sum, all
    * distributive — under its own batch partition (dynamic idempotent
    * overwrite). Because the frozen model makes every doc's score
    * independent of its batch, the merged store equals the full-corpus
    * scoring pass BIT-identically under any split or redelivery. */
  /** One batch's per-source partials against the frozen model: doc and
    * pass counts plus a DECIMAL score sum — every column distributive. */
  def classifierPartialsOf(batch: DataFrame, model: DataFrame): DataFrame =
    graft.llm.TextOps.scoreAgainstModel(batch, model)
      .join(batch.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("selected"), lit(1))).as("n_sel"),
        sum(col("score").cast("decimal(28,12)")).as("sum_score"))

  def classifierStoreSink(batch: DataFrame, batchId: Long, dir: String,
      model: DataFrame): Unit =
    classifierPartialsOf(batch, model)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The pass-rate readout over ANY union of [[classifierPartialsOf]]
    * rows: re-sum the distributive partials, then derive the integer
    * per-mille pass rate and the rounded mean score. */
  def classifierMergeFrom(parts: DataFrame): DataFrame =
    parts
      .groupBy("source")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("n_sel").as("n_sel"),
        sum("sum_score").as("sum_score"))
      .select(col("source"), col("n_docs"), col("n_sel"),
        expr("(1000 * n_sel) div n_docs").as("sel_permille"),
        r4(col("sum_score").cast("double") / col("n_docs")).as("mean_score"))
      .orderBy("source")

  /** The accumulated store readout: [[classifierMergeFrom]] over the
    * per-batch partitions. */
  def classifierStoreReadout(s: SparkSession, dir: String): DataFrame =
    classifierMergeFrom(s.read.parquet(dir))

  /** ST15 batch twin: two disjoint batches scored against the stored
    * model + an at-least-once redelivery, then the merged readout —
    * gated by the FULL-corpus scoring oracle verbatim (exactness under
    * batching, not mere consistency). */
  val streamClassifierStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "classifier_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val model = graft.llm.TextOps.nbModelStored(s, d)
      val c = s"$dd/c"
      classifierStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c, model)
      classifierStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c, model)
      // at-least-once redelivery of batch 0: must overwrite, not append
      classifierStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c, model)
    }
    classifierStoreReadout(s, s"$dir/c")
  }

  /** ST16: stream-maintained SQ8 RANGE monitor — the scalar quantizer's
    * drift alarm: SQ8 codes are only as good as the per-dimension
    * [mn, mx] ranges they were trained on, and arriving data OUTSIDE the
    * stored range silently clamps to 0/255. Each batch folds its vectors
    * into per-dim (mn, mx) partials under its own partition (dynamic
    * idempotent overwrite); min/max are MONOTONE-distributive, so the
    * merged store equals the full-corpus stats EXACTLY under any batch
    * split or redelivery — comparing it against the frozen `sq8` stats
    * artifact is the re-encode trigger. (Unlike the IVF delta, an SQ8
    * re-encode is corpus-proportional — which is exactly why production
    * freezes stats per index generation and watches this monitor.) */
  def sq8StatsSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    batch
      .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The accumulated range readout: re-min/max the per-batch partials. */
  def sq8StatsReadout(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy("pos").agg(min("mn").as("mn"), max("mx").as("mx"))
      .orderBy("pos")

  /** ST16 batch twin: two disjoint batches + an at-least-once
    * redelivery, then the merged readout — gated by the one-shot
    * full-corpus per-dim stats oracle (exactness, not consistency). */
  val streamSq8Stats: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "sq8_stats_stream", d) { dd =>
      val vecs = t(s, d, "embeddings")
      val p = s"$dd/p"
      sq8StatsSink(vecs.filter(col("vec_id") % 2 === 0), 0L, p)
      sq8StatsSink(vecs.filter(col("vec_id") % 2 === 1), 1L, p)
      // at-least-once redelivery of batch 0: must overwrite, not append
      sq8StatsSink(vecs.filter(col("vec_id") % 2 === 0), 0L, p)
    }
    sq8StatsReadout(s, s"$dir/p")
  }

  /** ST17: stream-maintained LM-SCORE store — the perplexity-tier twin of
    * the classifier monitor (ST15): tier CUTS are rank statistics (not
    * distributive), but per-doc LM scores against a FROZEN bigram LM
    * ([[graft.llm.TextOps.bigramLmStored]] — training is a separate
    * periodic job) are batch-independent, so the stream maintains the
    * per-doc SCORE table (one row per doc — KB-scale beside the corpus)
    * under per-batch dynamic idempotent overwrite, and the readout
    * re-RANKS the merged scores into head/middle/tail. Score being a pure
    * per-doc function of the frozen model makes the merged store equal
    * the one-shot full-corpus pass BIT-identically under any batch split
    * or redelivery; the readout's ntile runs over the score table, never
    * the corpus. */
  def pplStoreSink(batch: DataFrame, batchId: Long, dir: String,
      ab: DataFrame, ctx: DataFrame, v: DataFrame): Unit =
    graft.llm.TextOps.bigramNllAgainstLm(batch, ab, ctx, v)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The accumulated tier readout: rank the merged per-doc scores. */
  def pplStoreReadout(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.pplTiersFrom(
      s.read.parquet(dir).select("doc_id", "source", "n_bigrams", "nll"))

  /** ST17 batch twin: two disjoint batches scored against the frozen LM
    * + an at-least-once redelivery, then the ranked readout — gated by
    * `text_ppl_buckets`' full-corpus oracle verbatim. */
  val streamPplStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "ppl_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val (ab, ctx, v) = graft.llm.TextOps.bigramLmStored(s, d)
      val c = s"$dd/c"
      pplStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c, ab, ctx, v)
      pplStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c, ab, ctx, v)
      // at-least-once redelivery of batch 0: must overwrite, not append
      pplStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c, ab, ctx, v)
    }
    pplStoreReadout(s, s"$dir/c")
  }

  /** ST13: stream-maintained n-gram NOVELTY store — the streamed form is
    * the NATURAL one: novelty is defined by arrival order (what fraction
    * of this doc's trigrams has the corpus never seen before?), so a
    * continuously ingesting pipeline wants it answered per batch without
    * re-scanning history. Each micro-batch writes two doc-bounded
    * partials under its own partition (dynamic idempotent overwrite):
    * its grams' batch-local first-seen table (g, first_doc = min doc_id
    * within the batch) and its docs' distinct-gram counts. The readout
    * re-mins the first-seen rows across batches — min is
    * monotone-distributive, so the merged table equals the whole-corpus
    * recompute EXACTLY under any batch split or redelivery order (the
    * label store's algebra). At 100 TB: an arriving batch pays one
    * explode over itself; history is never re-read. */
  def noveltyStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit = {
    val occ = graft.llm.TextOps.gramOccurrencesOf(batch).localCheckpoint()
    occ.groupBy("g").agg(min("doc_id").as("first_doc"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/grams")
    occ.groupBy("doc_id").agg(countDistinct("g").as("n_grams"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/docs")
  }

  /** The accumulated novelty readout: re-min the per-batch first-seen
    * partials, then the shared doc-level join. */
  def noveltyStoreReadout(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.noveltyFromParts(
      s.read.parquet(s"$dir/grams").select("g", "first_doc"),
      s.read.parquet(s"$dir/docs").select("doc_id", "n_grams"))

  /** ST14: stream-maintained semantic-DECONTAMINATION store — the
    * benchmark side is the one that CHANGES over time (a new eval suite
    * lands; the corpus snapshot under audit is fixed), so the streamed
    * form answers "what does this new benchmark contaminate?" without
    * re-running the whole-bench pass. Init persists the decon index
    * (stored-quantizer centroids + corpus inverted lists); each arriving
    * bench batch probes the FIXED index
    * ([[graft.llm.Similarity.deconHitsAgainstIndex]]: probe selection
    * depends only on the fixed centroids, hits only on the fixed lists)
    * and writes its (bid, nid, cosine) hit partials under its own batch
    * partition — dynamic idempotent overwrite, so a redelivered batch
    * replaces exactly itself. The readout re-rolls count + struct-max
    * across batches — both distributive, so the merged store equals the
    * one-shot whole-bench decon BIT-identically under any batch split
    * or redelivery order. At 100 TB: a new eval suite costs one probe
    * pass over ITS OWN vectors; the corpus is never re-scanned. */
  def deconStoreInit(s: SparkSession, d: String, dir: String): Unit = {
    val (cents, inv) = graft.llm.Similarity.deconIndexArtifacts(s, d)
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    inv.write.mode("overwrite").parquet(s"$dir/inv")
  }

  def deconDeltaSink(batch: DataFrame, batchId: Long, dir: String,
      tau: Double = 0.35): Unit = {
    val s = batch.sparkSession
    graft.llm.Similarity.deconHitsAgainstIndex(batch,
        s.read.parquet(s"$dir/cents"), s.read.parquet(s"$dir/inv"), tau)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/hits")
  }

  /** The accumulated readout in `sim_semantic_decon`'s output shape. */
  def deconStoreReadout(s: SparkSession, dir: String): DataFrame =
    graft.llm.Similarity.deconRollup(
      s.read.parquet(s"$dir/hits").select("bid", "nid", "cosine"))

  /** ST23: the MULTIMODAL twin of ST14 — stream-maintained semantic
    * decon store over PAYLOAD embeddings: a new eval suite's images
    * arrive in batches, each batch probes the FIXED stored mm index
    * (same [[graft.llm.Similarity.deconHitsAgainstIndex]] primitive —
    * probe selection depends only on the frozen centroids, hits only on
    * the frozen lists), hit partials land under the batch's own
    * partition. Merged readout == the one-shot mm_semantic_decon pass
    * BIT-identically under any split/redelivery, at the mm τ. */
  def mmDeconStoreInit(s: SparkSession, d: String, dir: String): Unit = {
    val (cents, inv) = graft.llm.Similarity.deconIndexArtifactsFrom(
      graft.llm.Multimodal.mmIndex(s, d), col("vec_id") % 10 === 0)
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    inv.write.mode("overwrite").parquet(s"$dir/inv")
  }

  /** ST23 batch twin / driver gate: index init + three bench-payload
    * deliveries + an at-least-once redelivery, readout in
    * mm_semantic_decon's output shape and gated by its oracle VERBATIM. */
  val streamMmDeconStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "mm_decon_store_stream", d) { dd =>
      val x = s"$dd/x"
      mmDeconStoreInit(s, d, x)
      val bench = graft.llm.Multimodal.mmVecsOf(s, d)
        .filter(col("vec_id") % 10 === 0)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 0), 0L, x, tau = 0.999)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 1), 1L, x, tau = 0.999)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 2), 2L, x, tau = 0.999)
      // at-least-once redelivery of batch 1 AFTER batch 2: the overwrite
      // replaces identical partials, the store must not drift
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 1), 1L, x, tau = 0.999)
    }
    deconStoreReadout(s, s"$dir/x")
  }

  /** ST12: stream-maintained NEAR-DUP PAIR-GRAPH delta — the dedup twin
    * of ST10, with a stronger contract: MinHash needs no training, so
    * the accumulated store IS the full-corpus pair set exactly (not
    * quantizer-consistent — identical). [[pairStoreInit]] seeds the
    * base index (bands + verify sets) and pairs; each micro-batch then
    * (a) computes its in-row signatures, (b) joins them against the
    * ACCUMULATED index (base + every earlier delta — so cross-batch
    * pairs are found), (c) adds its banded internal pairs, writing all
    * pairs AND its own index rows under its own batch partition with
    * dynamic idempotent overwrite. A redelivered batch can only rewrite
    * its own partitions; a redelivery arriving AFTER later batches may
    * re-derive pairs those batches already recorded — exact duplicates
    * by construction (same signatures, same jaccard), collapsed by the
    * readout's distinct, so the store never drifts. At 100 TB: history
    * is never re-shingled; each arriving batch pays its own signature
    * pass plus band-bucket joins. */
  def pairStoreInit(base: DataFrame, dir: String): Unit = {
    val sh = graft.llm.Dedup.shinglesOf(base).localCheckpoint()
    graft.llm.Dedup.minhashBandsFromShingles(sh)
      .write.mode("overwrite").parquet(s"$dir/bands")
    graft.llm.Dedup.docShingleSetsFromShingles(sh)
      .write.mode("overwrite").parquet(s"$dir/sets")
    graft.llm.Dedup.minhashScoredPairsFrom(sh)
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"),
        graft.operators.Common.r4(col("jaccard")).as("jaccard"))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/pairs")
  }

  def pairDeltaSink(batch: DataFrame, batchId: Long, dir: String): Unit = {
    val s = batch.sparkSession
    val signed = graft.llm.Dedup.minhashInRow(batch).localCheckpoint()
    def withDelta(basePath: String, deltaPath: String, cols: Seq[String]) = {
      val b = s.read.parquet(basePath).selectExpr(cols: _*)
      // Resolve through Hadoop's FileSystem so URI paths (file:/, hdfs:,
      // s3a:) see their deltas too — java.io.File would silently report
      // false for any non-local path and drop cross-batch pairs.
      val p = new org.apache.hadoop.fs.Path(deltaPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        b.unionByName(s.read.parquet(deltaPath).selectExpr(cols: _*))
      else b
    }
    val bands = withDelta(s"$dir/bands", s"$dir/dbands",
      Seq("doc_id", "band", "bh"))
    val sets = withDelta(s"$dir/sets", s"$dir/dsets",
      Seq("doc_id", "hs", "n_sh"))
    val cross = graft.llm.Dedup.crossPairsSigned(signed, bands, sets)
    val internal = graft.llm.Dedup
      .minhashScoredPairsFrom(graft.llm.Dedup.shinglesOf(batch))
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"),
        graft.operators.Common.r4(col("jaccard")).as("jaccard"))
    cross.unionByName(internal).distinct()
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/pairs")
    signed.select(col("doc_id"), posexplode(col("bands")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/dbands")
    signed.select("doc_id", "hs", "n_sh")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/dsets")
  }

  /** The accumulated pair-graph readout: distinct pairs across base and
    * every delta partition — exact duplicates from post-hoc
    * redeliveries collapse here. */
  def pairStoreReadout(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/pairs")
      .select("da", "db", "jaccard").distinct()
      .orderBy(desc("jaccard"), asc("da"), asc("db"))

  /** ST12b: incremental connected-component LABEL maintenance over the
    * streamed pair store — the missing streamed maintainer for the
    * canonical/curation layer. Labels live as (id, lbl, batch_id) rows
    * under per-batch partitions; the CURRENT label of an id is
    * `min(lbl)` across all its rows. That min-merge readout is what
    * makes the store exact AND redelivery-proof: new pairs can only
    * MERGE components, and a merge only ever LOWERS a member's label
    * (to the new component minimum), so labels are monotone decreasing
    * over batches and per-id min ≡ latest. A redelivered batch
    * recomputes against already-merged state, finds nothing to remap,
    * and writes nothing — its original partition stands, stale-but-
    * higher rows never win a min.
    *
    * Cost per delta batch at 100 TB: the condensed merge graph has one
    * node per TOUCHED component (+ new ids) — KB-scale; label rewrites
    * touch only members of components the batch merged
    * (delta-proportional, never corpus-proportional). */
  def labelStoreInit(s: SparkSession, dir: String): Unit =
    graft.llm.Dedup.clusterLabelsFrom(
        s.read.parquet(s"$dir/pairs").select("da", "db"))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/labels")

  def labelDeltaSink(s: SparkSession, batchId: Long, dir: String): Unit = {
    // this batch's pairs (written by pairDeltaSink just before) — the
    // partition filter prunes to one batch directory
    val newPairs = s.read.parquet(s"$dir/pairs")
      .filter(col("batch_id") === batchId).select("da", "db")
    val cur = s.read.parquet(s"$dir/labels")
      .groupBy("id").agg(min("lbl").as("lbl"))
    // condense each new edge to its endpoints' current component labels
    // (an unseen endpoint represents itself); CC over this label graph
    // yields the new minimum of every merged group
    val condensed = newPairs
      .join(cur.select(col("id").as("da"), col("lbl").as("la")), Seq("da"), "left")
      .join(cur.select(col("id").as("db"), col("lbl").as("lb")), Seq("db"), "left")
      .select(coalesce(col("la"), col("da")).as("da"),
        coalesce(col("lb"), col("db")).as("db"))
      .filter(col("da") =!= col("db"))
    val rm = graft.llm.Dedup.clusterLabelsFrom(condensed)
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("old_lbl"), col("lbl").as("new_lbl"))
    // rows this batch contributes: stored ids whose component merged
    // (label lowered), plus first labels for the batch's new ids
    val updatedOld = cur.join(broadcast(rm), cur("lbl") === rm("old_lbl"))
      .select(col("id"), col("new_lbl").as("lbl"))
    val nodes = newPairs.select(col("da").as("id"))
      .unionByName(newPairs.select(col("db").as("id"))).distinct()
    val newLabeled = nodes.join(cur, Seq("id"), "left_anti")
      .join(broadcast(rm.withColumnRenamed("old_lbl", "id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("id")).as("lbl"))
    updatedOld.unionByName(newLabeled)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/labels")
  }

  /** The maintained labels in [[graft.llm.Dedup.clusterLabelsFrom]]'s
    * output shape: per-id min across every batch partition. */
  def labelStoreReadout(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/labels")
      .groupBy("id").agg(min("lbl").as("lbl"))

  /** ST10 (forward idea ac, streaming half): stream-maintained IVF
    * INVERTED-LIST delta store — the ingestion path of a continuously
    * growing ANN index. Each micro-batch of new embeddings is assigned
    * against the FIXED stored centroids
    * ([[graft.llm.Similarity.assignAgainstCentroids]]: one broadcast
    * pass, stateless) and written under its own (cid, batch_id)
    * partitions — dynamic partition overwrite, so a redelivered batch
    * replaces exactly its own rows (the [[idempotentAppend]] recipe).
    * cid stays the leading partition column so probes partition-prune to
    * the probed lists, delta rows included. Assignment depends only on
    * the fixed centroids, so base ∪ delta is bit-identical to a batch
    * rebuild over the grown corpus with the same quantizer — probes stay
    * exact while the (expensive, rare) centroid re-train is a separate
    * scheduled job, monitored by `sim_quantizer_refresh`'s drift report
    * and `sim_knn_recall`'s quality census. */
  def invlistStoreSink(batch: DataFrame, batchId: Long, dir: String,
      centroids: DataFrame): Unit =
    graft.llm.Similarity.assignAgainstCentroids(batch, centroids)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("cid", "batch_id").parquet(dir)

  /** Read the streamed delta back in inverted-list shape. Partition
    * columns come back as the narrowest inferred type (cid as INT) — the
    * cast here restores the artifact schema so the delta unions cleanly
    * onto the stored base lists. */
  def invlistDelta(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir).select(col("cid").cast("long").as("cid"),
      col("nid"), col("nv"), col("nn"))

  /** Batch-twin query for the oracle: identical plan to
    * tumblingCountsStream minus the watermark (a no-op in batch). */
  val streamTumbling: Q = (s, d) =>
    tumblingCounts(t(s, d, "events"))
      .orderBy("w_start", "event_type")

  /** ST3 batch twin: `session_window` runs the same gap-merge in batch
    * mode, which lets the DuckDB oracle verify the session semantics via
    * the classic gaps-and-islands rewrite (lag → boundary flag →
    * running-sum session id). Boundary convention checked exactly: a gap
    * of ≥ the 30-minute window starts a NEW session (Spark session
    * intervals are half-open, end = last event + gap). */
  val streamSessions: Q = (s, d) =>
    sessionCountsBatch(t(s, d, "events"))
      .orderBy("user_id", "s_start")

  /** sessionCounts minus the watermark (watermarks require streaming). */
  def sessionCountsBatch(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r2(sum("value")).as("total_value"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** ST7: stream-stream interval join — enrich each purchase with every
    * signup by the same user within the preceding `horizon`. BOTH sides
    * carry watermarks and the join predicate bounds s_ts to a time band
    * around p_ts, which is what lets Spark EVICT join state: a buffered
    * signup older than (purchase watermark − horizon) can never match
    * again and is dropped, so state is O(horizon × rate), not O(stream).
    * An unbanded stream-stream join would buffer forever — the predicate
    * is load-bearing, not an optimization. Inner join → append mode;
    * `left_outer` additionally emits an unmatched purchase (null signup
    * columns) once the GLOBAL watermark proves no matching signup can
    * still arrive — i.e. null results are watermark-delayed, not
    * immediate (StreamsSpec ST7b pins this). */
  def purchaseSignupJoin(purchases: DataFrame, signups: DataFrame,
      lateness: String = "1 hour", horizon: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val sg = signups.withWatermark("ts", lateness)
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(sg,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"interval $horizon"),
      joinType)
  }

  /** ST7 batch twin for the oracle: the identical plan in batch mode
    * (watermarks are a no-op in batch), aggregated to a deterministic
    * summary row. */
  val streamJoin: Q = (s, d) => {
    val ev = t(s, d, "events")
    purchaseSignupJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "signup"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases"),
        countDistinct(col("p_user")).as("n_users"))
  }

  /** ST7b batch twin: the LEFT-OUTER form — unmatched purchases survive
    * with null signup columns (in streaming they emit watermark-delayed;
    * in batch they appear directly — same result set, which is the point
    * of the twin). Summarized deterministically: pair/purchase counts
    * split by matched vs unmatched. */
  val streamJoinLo: Q = (s, d) => {
    val ev = t(s, d, "events")
    purchaseSignupJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "signup"),
      joinType = "left_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("s_ts")).as("n_matched"),
        countDistinct(col("p_id")).as("n_purchases"),
        countDistinct(when(col("s_ts").isNull, col("p_id"))).as("n_unmatched_purchases"))
  }

  /** ST8 batch twin / driver gate: replay the streaming maintenance in
    * batch — two deterministic "micro-batches" (an event_id parity
    * split) sunk through [[sketchStoreSink]], batch 0 REDELIVERED to
    * prove the idempotent overwrite — then the dashboard merge over the
    * STREAMED store for the same 8-day window as `sketch_dashboard`,
    * pinned against exact raw-events values. A double-counted
    * redelivery, dropped partial, or mis-pruned day breaks the exact-n
    * pin; a broken cross-batch merge breaks the p50/HLL pins. Oracle:
    * identical SQL to `sketch_dashboard` (the maintained store must be
    * indistinguishable from the batch rollup at read time). */
  val streamSketchStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "sketch_store_stream", d) { dd =>
      val ev = t(s, d, "events")
      val daily = s"$dd/daily"
      sketchStoreSink(ev.filter(col("event_id") % 2 === 0), 0L, daily)
      sketchStoreSink(ev.filter(col("event_id") % 2 === 1), 1L, daily)
      // at-least-once redelivery of batch 0: must overwrite, not append
      sketchStoreSink(ev.filter(col("event_id") % 2 === 0), 0L, daily)
    }
    graft.operators.Aggregates.dashboardPins(s, d,
      graft.operators.Aggregates.sketchMergeFrame(
        s.read.parquet(s"$dir/daily"), "2024-01-05", "2024-01-12"),
      "2024-01-05", "2024-01-12")
  }

  /** ST11 batch twin / driver gate: replay the quality-store maintenance
    * in batch — two deterministic micro-batches (doc_id parity split)
    * sunk through [[qualityStoreSink]], batch 0 REDELIVERED to prove the
    * idempotent overwrite — then the monitor merge over the streamed
    * store, which must be indistinguishable from a one-shot whole-corpus
    * readout (the oracle computes exactly that). */
  val streamQualityStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "quality_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val q = s"$dd/q"
      qualityStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, q)
      qualityStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, q)
      // at-least-once redelivery of batch 0: must overwrite, not append
      qualityStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, q)
    }
    graft.llm.TextOps.qualityMergeFrom(s.read.parquet(s"$dir/q"))
  }

  /** ST12b batch twin: init + two label-maintained delta batches + an
    * out-of-order redelivery, then `dedup_canonical`'s readout over the
    * MAINTAINED labels — gated by dedup_canonical's oracle verbatim, so
    * the incremental CC is held to exact equality with a full-corpus
    * rebuild (not mere consistency). */
  val streamCanonicalStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "canonical_store_stream", d) { dd =>
      val docs = t(s, d, "documents").select("doc_id", "text")
      val p = s"$dd/p"
      pairStoreInit(docs.filter(col("doc_id") % 3 === 0), p)
      labelStoreInit(s, p)
      pairDeltaSink(docs.filter(col("doc_id") % 3 === 1), 1L, p)
      labelDeltaSink(s, 1L, p)
      pairDeltaSink(docs.filter(col("doc_id") % 3 === 2), 2L, p)
      labelDeltaSink(s, 2L, p)
      // at-least-once redelivery of batch 1 AFTER batch 2: the label
      // store must not drift (monotone min-merge makes this a no-op)
      pairDeltaSink(docs.filter(col("doc_id") % 3 === 1), 1L, p)
      labelDeltaSink(s, 1L, p)
    }
    graft.llm.Dedup.canonicalFromLabels(
      labelStoreReadout(s, s"$dir/p"), t(s, d, "documents"))
  }

  /** ST13 batch twin / driver gate: three deterministic micro-batches
    * (doc_id mod-3 split) sunk through [[noveltyStoreSink]], batch 1
    * REDELIVERED out of order, then the merged readout — gated by
    * `text_ngram_novelty`'s oracle VERBATIM: the maintained store must
    * be indistinguishable from a one-shot whole-corpus recompute. */
  /** The ST13 store directory, built once per (session, dataset) — shared
    * by the batch twin and the forget-propagation pass
    * ([[graft.llm.Forget]]), which re-processes affected batch partitions
    * the way T13e does for the dictionary. Batch rule: doc_id %
    * [[dictBatches]] (the store-family rule, readout-invariant). */
  private[graft] def noveltyStoreDir(s: SparkSession, d: String): java.io.File =
    graft.llm.Artifacts.buildOnce(s, "novelty_store_stream", d) { dd =>
      val docs = t(s, d, "documents").select("doc_id", "text")
      val n = s"$dd/n"
      (0L until dictBatches).foreach { b =>
        noveltyStoreSink(docs.filter(col("doc_id") % dictBatches === b), b, n)
      }
      // at-least-once redelivery of batch 1 AFTER the rest: min-merge
      // makes the rewrite a no-op, the store must not drift
      noveltyStoreSink(docs.filter(col("doc_id") % dictBatches === 1), 1L, n)
    }

  val streamNoveltyStore: Q = (s, d) =>
    noveltyStoreReadout(s, s"${noveltyStoreDir(s, d)}/n")

  /** ST14 batch twin / driver gate: index init + three bench deliveries
    * (vec_id mod-3 split of the bench tenth) + an out-of-order
    * redelivery, then the merged readout — gated by
    * `sim_semantic_decon`'s oracle VERBATIM: the maintained store must
    * equal the one-shot whole-bench decon exactly. */
  val streamDeconStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "decon_store_stream", d) { dd =>
      val x = s"$dd/x"
      deconStoreInit(s, d, x)
      val bench = t(s, d, "embeddings").filter(col("vec_id") % 10 === 0)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 0), 0L, x)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 1), 1L, x)
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 2), 2L, x)
      // at-least-once redelivery of batch 1 AFTER batch 2: the overwrite
      // replaces identical partials, the store must not drift
      deconDeltaSink(bench.filter(col("vec_id") % 3 === 1), 1L, x)
    }
    deconStoreReadout(s, s"$dir/x")
  }

  /** ST18: stream-maintained RULE-PROFILE monitor — the heuristic-filter
    * twin of the classifier pass-rate store: "which Gopher/C4 rule is
    * eating source X, and is that drifting?" Each micro-batch computes
    * its own per-doc rule verdicts (stateless in-row string work — a
    * doc's verdicts depend only on its own bytes, never on the corpus)
    * and folds them into per-source failure-count partials
    * ([[graft.llm.TextOps.rulePartialsOf]] — every column a distributive
    * sum) written under the batch's own partition (dynamic idempotent
    * overwrite, [[idempotentAppend]]'s recipe). Batch-independent
    * verdicts make the merged store equal the full-corpus profile
    * BIT-identically under any split or redelivery — gated here by
    * text_rule_profile's oracle VERBATIM. At 100 TB/day the monitor
    * refresh is |sources|×|batches| KB-scale rows, corpus never
    * rescanned. */
  def ruleStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.rulePartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  def ruleStoreReadout(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.ruleProfileMergeFrom(s.read.parquet(dir))

  /** ST18 batch twin: two disjoint batches + an at-least-once redelivery
    * of batch 0, then the merged readout — exactness under batching, not
    * mere consistency. */
  val streamRuleStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "rule_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = s"$dd/c"
      ruleStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
      ruleStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c)
      // at-least-once redelivery of batch 0: must overwrite, not append
      ruleStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
    }
    ruleStoreReadout(s, s"$dir/c")
  }

  /** ST19: stream-maintained BOILERPLATE-LINE table — the incremental
    * object behind line dedup: at 100 TB the (line-hash → doc count)
    * frequency table is what a pipeline maintains as batches arrive, and
    * the rewrite pass is a stateless probe against it. Each micro-batch
    * folds its docs into per-line partials
    * ([[graft.llm.TextOps.lineFreqsOf]]: doc counts distinct WITHIN the
    * batch — docs live in exactly one batch, so the counts are
    * distributive and the merged store equals the full-corpus frequency
    * table EXACTLY under any split; redelivery overwrites its own batch
    * partition). The gate rewrites the corpus against the MERGED store
    * and must land on text_line_dedup's oracle VERBATIM — store-then-
    * rewrite equals the one-shot pass bit-for-bit. */
  def lineStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.lineFreqsOf(batch)
      .withColumnRenamed("ldf", "n_docs")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The merged frequency table over the store's batch partitions. */
  def lineStoreFreqs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy("lh")
      .agg(sum("n_docs").as("ldf"))

  /** ST19 batch twin: two disjoint batches + an at-least-once redelivery
    * build the store; the corpus rewritten against the merged table is
    * gated by the one-shot oracle verbatim. */
  private[graft] def lineStoreDir(s: SparkSession, d: String): java.io.File =
    graft.llm.Artifacts.buildOnce(s, "line_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = s"$dd/c"
      lineStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
      lineStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c)
      // at-least-once redelivery of batch 0: must overwrite, not append
      lineStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
    }

  val streamLineStore: Q = (s, d) =>
    graft.llm.TextOps.lineDedupAgainst(
      t(s, d, "documents"), lineStoreFreqs(s, s"${lineStoreDir(s, d)}/c"))

  /** ST22: stream-maintained SECRET-scan monitor — the hygiene trio's
    * third member as its own standalone store (previously it rode only
    * inside ST20's composition): each micro-batch folds into per-source
    * flagged-doc partials ([[graft.llm.TextOps.secretPartialsOf]] — the
    * verdict is per-doc stateless, so the partials are distributive and
    * the merged store equals the one-shot corpus scan EXACTLY under any
    * split/redelivery). At 100 TB the monitor answers "did source X
    * just start leaking credentials?" from |sources|×|batches| KB-scale
    * rows — the corpus is never rescanned. */
  def secretStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.secretPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The merged per-source monitor over the store's batch partitions. */
  def secretStoreReadout(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy("source")
      .agg(sum("n_secret_docs").as("n_secret_docs"))
      .orderBy("source")

  /** ST22 batch twin / driver gate: two disjoint batches + an
    * at-least-once redelivery of batch 0, then the merged readout —
    * gated by the one-shot per-source secret profile (text_secret_scan's
    * flag arithmetic aggregated per source) VERBATIM. */
  val streamSecretStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "secret_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = s"$dd/c"
      secretStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
      secretStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c)
      // at-least-once redelivery of batch 0: must overwrite, not append
      secretStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
    }
    secretStoreReadout(s, s"$dir/c")
  }

  /** ST20: the streamed HYGIENE composition — the three r15 monitors
    * (ST18 rule partials, ST19 line frequencies, per-source secret
    * partials) co-maintained under ONE batch sink, then composed into
    * the capstone readout. Each store is individually distributive;
    * the composition proves they stay mutually consistent under the
    * same batch splits and redeliveries — gated by
    * text_hygiene_report's oracle VERBATIM (store-probe == one-shot
    * three-pass report bit-for-bit). At 100 TB: one arriving batch
    * folds into three KB-scale partial families; the report refresh
    * re-reads stores plus exactly one corpus pass (the line-count
    * probe, which needs the docs regardless). */
  def hygieneStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit = {
    graft.llm.TextOps.rulePartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/rules")
    graft.llm.TextOps.lineFreqsOf(batch)
      .withColumnRenamed("ldf", "n_docs")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/lines")
    graft.llm.TextOps.secretPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/secrets")
  }

  def hygieneStoreReadout(s: SparkSession, dir: String,
      docs: DataFrame): DataFrame =
    graft.llm.TextOps.hygieneReportAgainst(
      docs,
      s.read.parquet(s"$dir/lines").groupBy("lh").agg(sum("n_docs").as("ldf")),
      s.read.parquet(s"$dir/rules").drop("batch_id"),
      s.read.parquet(s"$dir/secrets").drop("batch_id"))

  /** ST20 batch twin: two disjoint batches + an at-least-once redelivery
    * across all three sub-stores, then the composed readout. */
  val streamHygieneStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "hygiene_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = s"$dd/c"
      hygieneStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
      hygieneStoreSink(docs.filter(col("doc_id") % 2 === 1), 1L, c)
      // at-least-once redelivery of batch 0: must overwrite, not append
      hygieneStoreSink(docs.filter(col("doc_id") % 2 === 0), 0L, c)
    }
    hygieneStoreReadout(s, s"$dir/c", t(s, d, "documents"))
  }

  /** ST24: stream-maintained INVERTED-INDEX dictionary — the keyword
    * search/curation term-statistics table (X13a) as an incrementally
    * maintained store: each micro-batch folds its docs into per-term
    * (df, cf, max_tf, best-(−tf, doc)) partials
    * ([[graft.llm.TextOps.dfPartialsOf]] — docs live in exactly one
    * batch, so df/cf sum exactly and the argmax-doc min-struct merges
    * without drift) written under the batch's own partition (dynamic
    * idempotent overwrite). The merged readout must equal the one-shot
    * dictionary BIT-identically under any split or redelivery — gated
    * by text_inverted_index's oracle VERBATIM. At 100 TB the refresh is
    * |vocabulary|×|batches| KB-scale rows; the corpus is never
    * re-tokenized. */
  /** Existence check through the path's OWN Hadoop FileSystem — a plain
    * java.io.File(dir).exists() only inspects the local disk, so for the
    * hdfs:// / s3a:// stores a 100 TB deployment actually uses it would
    * always answer false (r17 ADVICE on the late-store watermark guard). */
  private[graft] def fsExists(s: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The dictionary store's batch rule: doc_id % dictBatches. ≥8 batches
    * (r17 verdict #3) so a partial tombstone feed leaves genuinely
    * UNTOUCHED partitions — the |affected batches| ≪ |batches| cost claim
    * is exercisable (ForgetSpec pins it), not just narrated. Production
    * would key batches by ingest day; the modulus is the sandbox stand-in
    * and every readout is batch-rule-invariant (the merge is exact). */
  private[graft] val dictBatches = 8L

  def dfStoreSink(batch: DataFrame, batchId: Long, dir: String): Unit =
    graft.llm.TextOps.dfPartialsOf(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  def dfStoreReadout(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextOps.invertedIndexMergeFrom(s.read.parquet(dir))

  /** The ST24 store directory, built once per (session, dataset) — shared
    * by the batch twin below and the forget-propagation pass
    * ([[graft.llm.Forget]]), which re-processes affected batch partitions
    * in place of a corpus rebuild. Batch rule: doc_id % [[dictBatches]]. */
  private[graft] def dfStoreDir(s: SparkSession, d: String): java.io.File =
    graft.llm.Artifacts.buildOnce(s, "df_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = s"$dd/c"
      (0L until dictBatches).foreach { b =>
        dfStoreSink(docs.filter(col("doc_id") % dictBatches === b), b, c)
      }
      // at-least-once redelivery of batch 0: must overwrite, not append
      dfStoreSink(docs.filter(col("doc_id") % dictBatches === 0), 0L, c)
    }

  /** ST24 batch twin: [[dictBatches]] disjoint batches + an at-least-once
    * redelivery of batch 0, then the merged dictionary. */
  val streamDfStore: Q = (s, d) =>
    dfStoreReadout(s, s"${dfStoreDir(s, d)}/c")

  /** ST27: streamed FORGET maintenance — the compliance feed as a
    * STREAM (tombstone batches arriving over time) applied to the ST24
    * dictionary store, completing T13e's one-shot pass with the form a
    * real GDPR pipeline takes: deletes trickle in, the index must
    * converge to the fully-purged state, and a redelivered tombstone
    * batch must be a no-op. Each sink call (1) records its tombstone
    * batch under its own partition (dynamic idempotent overwrite), then
    * (2) re-derives the dictionary partials of ONLY the doc-batches its
    * tombstones touch, from the raw slice purged by the CUMULATIVE
    * stored tombstone set — monotone, so any redelivery or reordering
    * re-derives the same or a more-purged partial and the store can
    * only converge. At 100 TB each feed batch costs |affected doc
    * partitions|, never the corpus. */
  def forgetStoreSink(s: SparkSession, docs: DataFrame, tombBatch: DataFrame,
      batchId: Long, dir: String): Unit = {
    // UNION the incoming batch into its own partition rather than
    // overwriting it (r17 ADVICE): an at-least-once redelivery carrying a
    // DIFFERENT payload (payload drift, accidental batch-id reuse) must
    // not erase the earlier tombstones for this feed batch — a later
    // re-derive of their doc-batches would resurrect the forgotten docs.
    // Tombstones are monotone, so per-partition set-union keeps an
    // identical redelivery a no-op and lets a drifted one only ADD.
    // KB-scale feed batch → localCheckpoint breaks the read-then-
    // overwrite cycle on the partition being rewritten.
    val tombsDir = s"$dir/tombs"
    val merged = (
      if (fsExists(s, tombsDir))
        tombBatch.select("doc_id").unionByName(
          s.read.parquet(tombsDir).filter(col("batch_id") === batchId)
            .select("doc_id")).distinct()
      else tombBatch.select("doc_id")
    ).localCheckpoint()
    merged
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(tombsDir)
    val allTombs = s.read.parquet(tombsDir).select("doc_id")
    val affected: Seq[Long] = merged
      .select(pmod(col("doc_id"), lit(dictBatches)).as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    affected.foreach { bid =>
      dfStoreSink(
        docs.filter(col("doc_id") % dictBatches === bid)
          .join(broadcast(allTombs), Seq("doc_id"), "left_anti"),
        bid, s"$dir/c")
    }
  }

  /** ST27 batch twin: the full dictionary store, then two tombstone
    * feed batches (%37 then %41) + an out-of-order REDELIVERY of the
    * first — the merged readout must equal the one-shot dictionary over
    * the fully-purged corpus (the oracle IS that build). */
  val streamForgetStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "forget_store_stream", d) { dd =>
      val docs = t(s, d, "documents")
      val c = dd.toString
      (0L until dictBatches).foreach { b =>
        dfStoreSink(docs.filter(col("doc_id") % dictBatches === b), b, s"$c/c")
      }
      val t37 = docs.select("doc_id").filter(col("doc_id") % 37 === 0)
      val t41 = docs.select("doc_id").filter(col("doc_id") % 41 === 0)
      forgetStoreSink(s, docs, t37, 0L, c)
      forgetStoreSink(s, docs, t41, 1L, c)
      // at-least-once redelivery of tombstone batch 0 AFTER batch 1:
      // the cumulative set already holds both batches, so the re-derive
      // is a no-op rewrite of the same partials
      forgetStoreSink(s, docs, t37, 0L, c)
    }
    dfStoreReadout(s, s"$dir/c")
  }

  /** ST27b: AS-OF (time travel) read of the FORGET feed — the compliance
    * counterpart of ST26b's CDC time travel, answering the auditor's
    * question "what did the dictionary hold BEFORE feed batch k's
    * tombstones landed?". The per-batch tombstone partitions the ST27
    * sink already writes ARE the history; an as-of read takes the
    * partition-pruned `batch_id <= k` tombstone prefix, re-derives ONLY
    * the doc-batches that prefix touches from the raw slice purged by
    * the prefix set, and serves every other doc-batch's partials from
    * the PRE-FORGET base store verbatim. Cost = |prefix-affected doc
    * batches|, never the corpus; no store state beyond what ST27 keeps
    * is needed. */
  def asofDictRead(s: SparkSession, docs: DataFrame, baseC: String,
      tombsDir: String, k: Long): DataFrame = {
    val prefix = s.read.parquet(tombsDir)
      .filter(col("batch_id") <= k).select("doc_id")
    val affected: Seq[Long] = prefix
      .select(pmod(col("doc_id"), lit(dictBatches)).as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val partCols = Seq("w", "df", "cf", "max_tf", "ntf", "top_doc")
    val untouched = s.read.parquet(baseC)
      .filter(!col("batch_id").isin(affected: _*))
      .select(partCols.map(col): _*)
    val rederived = affected.map { bid =>
      graft.llm.TextOps.dfPartialsOf(
        docs.filter(col("doc_id") % dictBatches === bid)
          .join(broadcast(prefix), Seq("doc_id"), "left_anti"))
        .select(partCols.map(col): _*)
    }
    graft.llm.TextOps.invertedIndexMergeFrom(
      (untouched +: rederived).reduce(_ unionByName _))
  }

  /** ST27b batch twin: THREE tombstone feed batches (%37, %41, %43) land
    * over time; the as-of read at k=1 must equal the one-shot dictionary
    * over the corpus purged by the FIRST TWO batches only — batch 2's
    * tombstones are in the store but outside the read's prefix. */
  val streamForgetAsof: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val dir = graft.llm.Artifacts.buildOnce(s, "forget_asof_stream", d) { dd =>
      Seq(37L -> 0L, 41L -> 1L, 43L -> 2L).foreach { case (m, bid) =>
        docs.select("doc_id").filter(col("doc_id") % m === 0)
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"$dd/tombs")
      }
    }
    asofDictRead(s, docs, s"${dfStoreDir(s, d)}/c", s"$dir/tombs", k = 1L)
  }

  /** ST25: stream-maintained LATE-DATA audit — the watermark
    * observability every production stream needs: how much data arrives
    * behind the clock, per source, and is that drifting? Batches are
    * time-sliced ten-day windows of the stream; a deterministic sliver
    * (event_id % 97 == 0) is DELIVERED one batch late, simulating the
    * stragglers a real bus produces. Each sink call reads the
    * KB-scale bmax column of the PRIOR batches' partials to reconstruct
    * the watermark (max event time seen so far, minus a 10-minute
    * tolerance), flags its own rows against it, and writes per-type
    * (n_total, n_late, bmax) partials under its own partition. The
    * watermark depends only on EARLIER batch ids, so an out-of-order
    * redelivery recomputes the identical flags — the store cannot
    * drift; gated by a one-shot SQL twin that replays the same batch
    * assignment and prefix-max watermark. */
  def lateStoreSink(s: SparkSession, batch: DataFrame, batchId: Long,
      dir: String): Unit = {
    // Guard the prior-partials read: if the FIRST-ever delivery arrives
    // out of order (batch 1 lands before batch 0 was ever written) the
    // store directory doesn't exist yet — treat the watermark as unset,
    // exactly the batchId == 0 branch, instead of throwing on the path.
    // The check goes through the path's OWN Hadoop FileSystem (r17
    // ADVICE: java.io.File only sees the local disk, so on hdfs:///s3a://
    // every batch would silently compute with an unset watermark). Note
    // the flags of a first delivery that arrived out of order are
    // corrected on its redelivery: the watermark then reads the earlier
    // batches' partials that have landed in the meantime.
    val wm: Option[java.sql.Timestamp] =
      if (batchId == 0L || !fsExists(s, dir)) None
      else {
        val prior = s.read.parquet(dir).filter(col("batch_id") < batchId)
        Option(prior.agg(max("bmax")).collect()(0).getTimestamp(0))
      }
    val lateFlag = wm match {
      case Some(w) => col("ts") < lit(w) - expr("INTERVAL 10 MINUTES")
      case None    => lit(false)
    }
    batch
      .withColumn("late", lateFlag)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max("ts").as("bmax"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)
  }

  def lateStoreReadout(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy("event_type")
      .agg(sum("n_total").as("n_total"), sum("n_late").as("n_late"))
      .withColumn("late_pm",
        expr("CAST(1000 * n_late div n_total AS BIGINT)"))
      .orderBy("event_type")

  /** The deterministic batch assignment shared by the sink replay and
    * the one-shot oracle: ten-day windows, with the %97 sliver shifted
    * one batch late (capped at the last batch). */
  private def lateBatchId = expr(
    """least(2L, (datediff(CAST(ts AS DATE), DATE '2024-01-01') div 10)
       + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END)""")

  /** ST25 batch twin: three time-sliced deliveries (with the straggler
    * sliver riding one batch late) + an at-least-once redelivery of
    * batch 1, then the merged audit. */
  val streamLateStore: Q = (s, d) => {
    val dir = graft.llm.Artifacts.buildOnce(s, "late_store_stream", d) { dd =>
      val ev = t(s, d, "events").withColumn("bid", lateBatchId)
      val c = s"$dd/c"
      lateStoreSink(s, ev.filter(col("bid") === 0L), 0L, c)
      lateStoreSink(s, ev.filter(col("bid") === 1L), 1L, c)
      lateStoreSink(s, ev.filter(col("bid") === 2L), 2L, c)
      // at-least-once redelivery of batch 1 AFTER batch 2: its watermark
      // reads only batch 0's partials — identical flags, no drift
      lateStoreSink(s, ev.filter(col("bid") === 1L), 1L, c)
    }
    lateStoreReadout(s, s"$dir/c")
  }

  /** ST26: stream-maintained CDC UPSERT store — the change-data-capture
    * feed as an incrementally maintained store (the Delta/Iceberg
    * change-feed shape): each micro-batch of change rows lands under its
    * own partition (dynamic idempotent overwrite — a redelivered batch
    * can only rewrite itself), and the readout applies the PER-KEY
    * LATEST change (last-writer-wins via max over struct(batch_id, …) —
    * a plain distributive aggregate over the KB-scale feed, no
    * state-store) to the base table through the same one-join apply as
    * the one-shot key. Gated by etl_merge_cdc's oracle VERBATIM: one
    * batch re-issues a subset of earlier changes under a later batch_id,
    * so the last-writer-wins path is exercised while the merged feed
    * still equals the one-shot change set; StreamsSpec pins the
    * DIFFERING-override case (later batch wins, redelivery cannot
    * regress it). At 100 TB the apply is one equi-join per refresh; the
    * feed itself is never rescanned, only its per-key argmax. */
  def cdcStoreSink(changes: DataFrame, batchId: Long, dir: String): Unit =
    changes
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  def cdcStoreApply(s: SparkSession, dir: String, base: DataFrame): DataFrame =
    cdcStoreApplyAsOf(s, dir, base, Long.MaxValue)

  /** ST26b: AS-OF (time travel) read over the upsert store — the state
    * after batch `k` is the store's batch partitions ≤ k run through the
    * SAME per-key last-writer-wins + one-join apply. Because batches land
    * under their own partitions, the prefix read is partition-pruned
    * (`batch_id <= k` hits the parquet partition filter) and nothing is
    * recomputed — exactly how a Delta/Iceberg VERSION AS OF read serves
    * history at 100 TB. */
  def cdcStoreApplyAsOf(s: SparkSession, dir: String, base: DataFrame,
      k: Long): DataFrame = {
    val latest = s.read.parquet(dir)
      .filter(col("batch_id") <= k)
      .groupBy("o_orderkey")
      .agg(max(struct(col("batch_id"), col("op"), col("chg_price"))).as("x"))
      .select(col("o_orderkey"), col("x.op").as("op"),
        col("x.chg_price").as("chg_price"))
    graft.etl.Transforms.cdcApply(base, latest)
  }

  /** ST26 batch twin: the deterministic change feed split into three
    * key-disjoint batches, an at-least-once redelivery of batch 1, and
    * a LATER batch re-issuing a subset of batch-0/1/2 changes verbatim
    * (the upsert-override path), then the applied readout. */
  /** The ST26 store directory, built once per (session, dataset) —
    * shared by the full-store readout and the as-of (time travel) read. */
  private[graft] def cdcStoreDir(s: SparkSession, d: String): java.io.File =
    graft.llm.Artifacts.buildOnce(s, "cdc_store_stream", d) { dd =>
      val changes = graft.etl.Transforms.cdcChangesOf(t(s, d, "orders"))
      val c = s"$dd/c"
      cdcStoreSink(changes.filter(col("o_orderkey") % 3 === 0), 0L, c)
      cdcStoreSink(changes.filter(col("o_orderkey") % 3 === 1), 1L, c)
      cdcStoreSink(changes.filter(col("o_orderkey") % 3 === 2), 2L, c)
      // at-least-once redelivery of batch 1: must overwrite, not append
      cdcStoreSink(changes.filter(col("o_orderkey") % 3 === 1), 1L, c)
      // upsert override: a later batch re-issues the %30==3 subset —
      // last-writer-wins must pick batch 3's (identical) rows
      cdcStoreSink(changes.filter(col("o_orderkey") % 30 === 3), 3L, c)
    }

  val streamCdcStore: Q = (s, d) =>
    cdcStoreApply(s, s"${cdcStoreDir(s, d)}/c", t(s, d, "orders"))

  /** ST26b driver key: the store AS OF batch 1 — batches {0, 1} hold the
    * key-disjoint %3 ∈ {0, 1} change slices, so the historical state is
    * the merge under exactly that change prefix; the oracle replays the
    * one-shot merge with the same prefix predicate. A later batch's
    * overrides (batch 3) must NOT leak into the k=1 read. */
  val streamUpsertAsof: Q = (s, d) =>
    cdcStoreApplyAsOf(s, s"${cdcStoreDir(s, d)}/c", t(s, d, "orders"), 1L)

  val queries: Map[String, Q] = Map(
    "stream_cdc_store" -> streamCdcStore,
    "stream_upsert_asof" -> streamUpsertAsof,
    "stream_forget_store" -> streamForgetStore,
    "stream_forget_asof" -> streamForgetAsof,
    "stream_df_store" -> streamDfStore,
    "stream_late_store" -> streamLateStore,
    "stream_rule_store" -> streamRuleStore,
    "stream_line_store" -> streamLineStore,
    "stream_secret_store" -> streamSecretStore,
    "stream_hygiene_store" -> streamHygieneStore,
    "stream_decon_store" -> streamDeconStore,
    "stream_mm_decon_store" -> streamMmDeconStore,
    "stream_novelty_store" -> streamNoveltyStore,
    "stream_tumbling" -> streamTumbling,
    "stream_sessions" -> streamSessions,
    "stream_join" -> streamJoin,
    "stream_join_lo" -> streamJoinLo,
    "stream_sketch_store" -> streamSketchStore,
    "stream_quality_store" -> streamQualityStore,
    "stream_pack_store" -> streamPackStore,
    "stream_mm_pack_store" -> streamMmPackStore,
    "stream_classifier_store" -> streamClassifierStore,
    "stream_sq8_stats" -> streamSq8Stats,
    "stream_ppl_store" -> streamPplStore,
    "stream_canonical_store" -> streamCanonicalStore)

  val oracle: Map[String, String] = Map(
    // the applied upsert store must equal the one-shot CDC merge:
    // etl_merge_cdc's oracle verbatim
    "stream_cdc_store" -> graft.etl.Transforms.oracle("etl_merge_cdc"),
    // the as-of read: the one-shot merge under the batch-{0,1} change
    // prefix (batches are key-disjoint %3 slices)
    "stream_upsert_asof" ->
      graft.etl.Transforms.mergeCdcOracle("o_orderkey % 3 <= 1"),
    // the streamed compliance feed must converge the dictionary to the
    // fully-purged one-shot build (union of both tombstone batches)
    "stream_forget_store" -> graft.llm.TextOps.invertedIndexOracleFrom(
      "(SELECT doc_id, text FROM documents " +
        "WHERE doc_id % 37 <> 0 AND doc_id % 41 <> 0) pd"),
    // the as-of read at k=1: the dictionary purged by the first TWO
    // tombstone batches only — batch 2 (%43) is stored but outside the
    // read's partition-pruned prefix
    "stream_forget_asof" -> graft.llm.TextOps.invertedIndexOracleFrom(
      "(SELECT doc_id, text FROM documents " +
        "WHERE doc_id % 37 <> 0 AND doc_id % 41 <> 0) pd"),
    // the maintained term dictionary must equal the one-shot build:
    // text_inverted_index's oracle verbatim
    "stream_df_store" -> graft.llm.TextOps.oracle("text_inverted_index"),
    // one-shot replay of the same batch assignment + prefix-max
    // watermark the sink reconstructs from stored partials
    "stream_late_store" ->
      """WITH b AS (
           SELECT event_id, ts, event_type,
                  least(2, (date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 10)
                        + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS bid
           FROM events),
           bm AS (SELECT bid, max(ts) AS bmax FROM b GROUP BY 1),
           wm AS (SELECT bid,
                         max(bmax) OVER (ORDER BY bid
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
                  FROM bm),
           fl AS (SELECT b.event_type,
                         CASE WHEN w.wm IS NOT NULL
                                   AND b.ts < w.wm - INTERVAL 10 MINUTE
                              THEN 1 ELSE 0 END AS late
                  FROM b JOIN wm w ON b.bid = w.bid)
         SELECT event_type, count(*) AS n_total,
                CAST(sum(late) AS BIGINT) AS n_late,
                CAST(1000 * sum(late) // count(*) AS BIGINT) AS late_pm
         FROM fl GROUP BY 1 ORDER BY 1""",
    // the maintained rule-failure profile must equal the one-shot
    // full-corpus pass: text_rule_profile's oracle verbatim
    "stream_rule_store" -> graft.llm.TextOps.oracle("text_rule_profile"),
    // the store-then-rewrite pass must equal the one-shot line dedup:
    // text_line_dedup's oracle verbatim
    "stream_line_store" -> graft.llm.TextOps.oracle("text_line_dedup"),
    // the maintained per-source secret monitor must equal the one-shot
    // scan: text_secret_scan's flag arithmetic aggregated per source
    "stream_secret_store" ->
      """WITH st AS (SELECT doc_id,
                  text || CASE WHEN doc_id % 7 = 3
                               THEN ' token_' || md5(CAST(doc_id AS VARCHAR))
                               ELSE '' END
                       || ' ' || repeat('a', 32) AS sec_text
           FROM documents),
           sk AS (SELECT doc_id, string_split(sec_text, ' ') AS toks FROM st),
           sc AS (SELECT doc_id,
                  CAST(len(list_filter(toks, tk ->
                    length(tk) >= 20
                    AND len(list_distinct(list_transform(
                          range(1, length(tk)+1),
                          i -> substr(tk, CAST(i AS INT), 1)))) >= 12
                    AND regexp_matches(tk, '[0-9]')
                    AND regexp_matches(tk, '[a-z]'))) AS BIGINT) AS n_secrets
           FROM sk)
         SELECT d.source,
                CAST(sum(CASE WHEN sc.n_secrets > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_secret_docs
         FROM documents d JOIN sc USING (doc_id)
         GROUP BY d.source ORDER BY d.source""",
    // the three co-maintained hygiene stores composed must equal the
    // one-shot three-pass report: text_hygiene_report's oracle verbatim
    "stream_hygiene_store" -> graft.llm.TextOps.oracle("text_hygiene_report"),
    // the maintained-label canonical readout must equal a full-corpus
    // rebuild: dedup_canonical's oracle verbatim
    "stream_canonical_store" -> graft.llm.Dedup.oracle("dedup_canonical"),
    // the maintained packing manifest must equal the one-shot packing
    // pass: text_pack_manifest's oracle verbatim
    "stream_pack_store" -> graft.llm.TextOps.oracle("text_pack_manifest"),
    "stream_mm_pack_store" -> graft.llm.Multimodal.oracle("mm_pack_manifest"),
    "stream_sq8_stats" ->
      """SELECT CAST(t.i - 1 AS INT) AS pos, min(v[t.i]) AS mn, max(v[t.i]) AS mx
         FROM (SELECT [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings)
         CROSS JOIN generate_series(1, 64) t(i)
         GROUP BY t.i ORDER BY pos""",
    "stream_classifier_store" ->
      s"""WITH ${graft.llm.TextOps.nbOracleCte},
           csc AS (SELECT f.doc_id,
                          round(CAST(sum(CAST(m.lo AS DECIMAL(28,12))) AS DOUBLE)
                                / count(*), 4) AS score
                   FROM qcf f JOIN qcm m USING (w) GROUP BY f.doc_id),
           cpj AS (SELECT d.source, csc.score, csc.score > 0 AS selected
                   FROM csc JOIN documents d USING (doc_id))
         SELECT source, count(*) AS n_docs,
                count(*) FILTER (WHERE selected) AS n_sel,
                CAST((1000 * count(*) FILTER (WHERE selected)) // count(*)
                     AS BIGINT) AS sel_permille,
                round(CAST(sum(CAST(score AS DECIMAL(28,12))) AS DOUBLE)
                      / count(*), 4) + 0.0 AS mean_score
         FROM cpj GROUP BY source ORDER BY source""",
    // the maintained per-doc LM-score store, re-ranked at readout, must
    // equal the one-shot train+rank pass: text_ppl_buckets' oracle verbatim
    "stream_ppl_store" -> graft.llm.TextOps.oracle("text_ppl_buckets"),
    // the maintained first-seen store must equal the one-shot recompute:
    // text_ngram_novelty's oracle verbatim
    "stream_novelty_store" -> graft.llm.TextOps.oracle("text_ngram_novelty"),
    // the maintained hit store must equal the one-shot whole-bench
    // decon: sim_semantic_decon's oracle verbatim
    "stream_decon_store" -> graft.llm.Similarity.oracle("sim_semantic_decon"),
    // the maintained mm decon store must equal the one-shot payload pass
    "stream_mm_decon_store" -> graft.llm.Multimodal.oracle("mm_semantic_decon"),
    // the streamed store must read back identical to the batch rollup:
    // sketch_dashboard's oracle verbatim
    "stream_sketch_store" ->
      """SELECT event_type, count(*) AS n, TRUE AS range_complete,
                TRUE AS p50_ok, TRUE AS hll_ok
         FROM events
         WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-12'
         GROUP BY event_type ORDER BY event_type""",
    // the streamed quality store must read back identical to a one-shot
    // whole-corpus readout: per-source stats computed directly
    "stream_quality_store" ->
      """WITH q AS (SELECT source, n_chars,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                           (CASE WHEN n_chars < 100 THEN 0.2 ELSE 1.0 END) *
                           (CASE WHEN n_stop = 0 THEN 0.5 ELSE 1.0 END) AS qv
                    FROM (SELECT source, n_chars, text,
                                 len(list_filter(string_split(text, ' '),
                                   w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop
                          FROM documents))
         SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                round(CAST(sum(CAST(qv AS DECIMAL(28,12))) AS DOUBLE) / count(*), 4)
                  AS mean_quality,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM q GROUP BY source ORDER BY source""",
    "stream_join" ->
      """SELECT count(*) AS n_pairs,
                CAST(count(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
                CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id
          AND s.ts <= p.ts
          AND s.ts >= p.ts - INTERVAL 2 HOUR""",
    "stream_join_lo" ->
      """SELECT count(*) AS n_rows,
                count(s.s_ts) AS n_matched,
                CAST(count(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
                CAST(count(DISTINCT CASE WHEN s.s_ts IS NULL
                                         THEN p.event_id END) AS BIGINT)
                  AS n_unmatched_purchases
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT user_id AS s_user, ts AS s_ts FROM events
                    WHERE event_type = 'signup') s
           ON p.user_id = s.s_user
          AND s.s_ts <= p.ts
          AND s.s_ts >= p.ts - INTERVAL 2 HOUR""",
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start, event_type,
                count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_sessions" ->
      """WITH o AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING) AS sid
                 FROM o)
         SELECT min(ts) AS s_start,
                max(ts) + INTERVAL 30 MINUTE AS s_end,
                user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, s_start""")
}
