package graft.llm

import org.apache.spark.sql.functions._

/** Invariants of the sequence-packing math (beyond the driver's
  * value-level oracle): segments must exactly tile the chunk space. A
  * violation here means a trainer reading "exactly ctx tokens per chunk"
  * gets a ragged batch. */
class PackingSpec extends graft.SparkSpec {
  import spark.implicits._

  private val ctx = 64L
  private val shards = 4L

  // random-length docs, deterministic seed; token text is irrelevant to
  // the packing math — only counts matter
  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    (0 until 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(200))("w").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("segments of each doc sum to its token count, in order, no overlap") {
    val segs = TextOps.packSegments(docs, ctx, shards)
    // per doc: Σ seg_len = n_tok and slices chain [0,a)[a,b)…[., n_tok)
    val perDoc = segs.orderBy("doc_id", "chunk")
      .groupBy("doc_id")
      .agg(sum("seg_len").as("total"),
        collect_list(struct(col("chunk"), col("tok_start"), col("tok_end"))).as("sl"))
      .join(TextOps.packChunks(docs, ctx, shards).select("doc_id", "n_tok"), Seq("doc_id"))
      .collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("total") === r.getAs[Long]("n_tok"), r)
      val sl = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("sl"))
        .sortBy(_.getLong(0))
      assert(sl.head.getLong(1) === 0L, s"first slice not at 0: $r")
      sl.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getLong(2) === b.getLong(1), s"gap/overlap between slices: $r")
          assert(b.getLong(0) === a.getLong(0) + 1, s"non-consecutive chunks: $r")
        case _ =>
      }
    }
  }

  test("every chunk except each shard's last holds exactly ctx tokens") {
    val segs = TextOps.packSegments(docs, ctx, shards)
    val chunks = segs.groupBy("shard", "chunk")
      .agg(sum("seg_len").as("fill"))
    val lastPerShard = chunks.groupBy("shard").agg(max("chunk").as("last"))
    val nonLast = chunks.join(lastPerShard, Seq("shard"))
      .filter(col("chunk") < col("last"))
    assert(nonLast.filter(col("fill") =!= ctx).isEmpty,
      nonLast.filter(col("fill") =!= ctx).collect().mkString(","))
    // and no chunk ever overflows
    assert(chunks.filter(col("fill") > ctx).isEmpty)
  }

  // docs with the standard srcN source convention the scheduler parses
  private lazy val srcDocs = {
    val rnd = new scala.util.Random(13)
    (0 until 300).map { i =>
      (i.toLong, s"src${i % 5}",
        Seq.fill(1 + rnd.nextInt(120))("w" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("train order: positions are contiguous 1..n per (epoch, shard)") {
    val ord = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
    val bad = ord.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("train order: instance token mass hits each source's scheduled quota") {
    val ord = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
    val got = ord.groupBy("source").agg(sum("n_tok").as("inst_tok"))
    val sched = TextOps.mixScheduleOf(srcDocs)
      .select(col("source"), col("scheduled_tok"))
    val maxTok = srcDocs.select(max(size(split(col("text"), " ")))).head.getInt(0).toLong
    // threshold-gate slack: quota <= delivered < quota + one max doc
    val bad = got.join(sched, Seq("source"))
      .filter(col("inst_tok") < col("scheduled_tok") ||
        col("inst_tok") >= col("scheduled_tok") + maxTok)
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("train order: every doc repeats full_epochs or full_epochs + 1 times") {
    val ord = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
    val reps = ord.groupBy("doc_id", "source").agg(count(lit(1)).as("n_rep"))
    val sched = TextOps.mixScheduleOf(srcDocs)
      .withColumn("full_epochs", expr("scheduled_tok div n_tok"))
      .select("source", "full_epochs")
    val bad = reps.join(sched, Seq("source"))
      .filter(col("n_rep") < col("full_epochs") ||
        col("n_rep") > col("full_epochs") + 1)
    assert(bad.isEmpty, bad.collect().mkString(","))
    // and epochs reshuffle: consecutive epochs must not share the same
    // doc->shard assignment for every doc (the md5(doc#epoch) point)
    val sameShard = ord.filter(col("epoch") === 0).select(col("doc_id"), col("shard").as("s0"))
      .join(ord.filter(col("epoch") === 1).select(col("doc_id"), col("shard").as("s1")),
        Seq("doc_id"))
    assert(sameShard.filter(col("s0") =!= col("s1")).count() > 0)
  }

  test("anneal order: anneal phase draws only classifier-selected docs, " +
    "positions contiguous per (phase, epoch, shard)") {
    val ord = TextOps.annealOrderFullOf(srcDocs, nShards = 4L)
    val sel = TextOps.classifierScoresOf(srcDocs)
      .filter(col("selected")).select("doc_id")
    // anneal instances ⊆ selected set
    val leak = ord.filter(col("phase") === 1)
      .join(sel, Seq("doc_id"), "left_anti")
    assert(leak.isEmpty, leak.collect().take(3).mkString(","))
    val bad = ord.groupBy("phase", "epoch", "shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString(","))
    // the two phases reshuffle independently: same doc, same epoch,
    // different salt → shard assignments must not all coincide
    val cross = ord.filter(col("phase") === 0 && col("epoch") === 0)
      .select(col("doc_id"), col("shard").as("s0"))
      .join(ord.filter(col("phase") === 1 && col("epoch") === 0)
        .select(col("doc_id"), col("shard").as("s1")), Seq("doc_id"))
    assert(cross.count() === 0 || cross.filter(col("s0") =!= col("s1")).count() > 0)
  }

  test("curriculum order: same instances as the uniform order, sequenced " +
    "quality-first within each shard") {
    val uni = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
    val cur = TextOps.curriculumOrderFullOf(srcDocs, nShards = 4L)
    // the gate is untouched: identical (doc, epoch, shard) instance sets
    val a = uni.select("doc_id", "epoch", "shard")
    val b = cur.select("doc_id", "epoch", "shard")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "curriculum must re-order, not re-select")
    // within each (epoch, shard), scores are non-increasing along pos
    val scores = TextOps.classifierScoresOf(srcDocs).select("doc_id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy("pos")
    val bad = cur.join(scores, Seq("doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("order audit: covers every (epoch, shard), masses match the " +
    "instance frame, tv_mix in [0,1]") {
    val ord = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
    val audit = TextOps.orderAuditOf(srcDocs, nShards = 4L)
    val direct = ord.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("d_docs"), sum("n_tok").as("d_tok"))
    val bad = audit.join(direct, Seq("epoch", "shard"), "full")
      .filter(col("n_docs").isNull || col("d_docs").isNull ||
        col("n_docs") =!= col("d_docs") || col("n_tokens") =!= col("d_tok") ||
        col("tv_mix") < 0.0 || col("tv_mix") > 1.0)
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("pack tuning: the closed-form chunk count matches an actual " +
    "packChunks run and waste is bounded by one chunk per shard") {
    val tuning = TextOps.packTuningOf(docs, nShards = shards,
        ctxs = Seq(32L, ctx, 256L)).collect()
      .map(r => r.getAs[Long]("ctx") -> r).toMap
    // the actual packed layout at ctx=64: a doc occupies through its END
    // token, so chunks per shard = max end-chunk + 1 (the manifest rule)
    val actual = TextOps.packChunks(docs, ctx, shards)
      .withColumn("endc",
        (col("chunk_id") * ctx + col("chunk_offset") + col("n_tok") - 1L) / ctx)
      .groupBy("shard").agg(max(col("endc").cast("long")).as("mx"))
      .collect().map(_.getAs[Long]("mx") + 1L).sum
    assert(tuning(ctx).getAs[Long]("n_chunks") === actual,
      "closed form disagrees with the packed layout")
    tuning.values.foreach { r =>
      val (c, w) = (r.getAs[Long]("ctx"), r.getAs[Long]("waste_tok"))
      assert(w >= 0L && w < c * shards, s"waste out of bounds: $r")
      val fill = r.getAs[Long]("fill_permille")
      assert(fill > 0L && fill <= 1000L, s"fill out of bounds: $r")
      assert(r.getAs[Long]("n_tokens") + w ===
        r.getAs[Long]("n_chunks") * c, s"padding identity broken: $r")
    }
  }

  test("epoch budget: full passes read exactly 1000 permille, only each " +
    "source's final epoch is partial, totals match the instance frame") {
    val budget = TextOps.epochBudgetOf(srcDocs, nShards = 4L).collect()
    val ord = TextOps.trainOrderFullOf(srcDocs, nShards = 4L)
      .groupBy("source").agg(sum("n_tok").as("inst_tok"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("inst_tok"))
      .toMap
    budget.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val r = rows.sortBy(_.getAs[Long]("epoch"))
      // epochs are dense from 0
      assert(r.map(_.getAs[Long]("epoch")).toSeq === (0L until r.length),
        s"$src epochs not dense")
      // every epoch but the last is a full pass; the last may be partial
      r.dropRight(1).foreach(row =>
        assert(row.getAs[Long]("fill_permille") === 1000L,
          s"$src non-final epoch not a full pass: $row"))
      assert(r.last.getAs[Long]("fill_permille") <= 1000L)
      // token mass re-aggregates the instance frame exactly
      assert(r.map(_.getAs[Long]("n_tokens")).sum === ord(src),
        s"$src budget mass != instance mass")
    }
  }

  test("order audit: a single-source corpus reads tv_mix = 0 everywhere; " +
    "the placement rank is pruned from the audit plan") {
    val one = srcDocs.withColumn("source", lit("src0"))
    val flat = TextOps.orderAuditOf(one, nShards = 4L)
    assert(flat.filter(col("tv_mix") =!= 0.0).isEmpty,
      "single-source shards must match the epoch mix exactly")
    // the audit never reads `pos`, so Catalyst must drop the per-(epoch,
    // shard) row_number window — auditing costs the gate pass only
    val plan = TextOps.orderAuditOf(srcDocs, nShards = 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "placement window survived column pruning")
  }

  test("mm pack: interleaved cost arithmetic and chunk bounds") {
    val mm = Multimodal.mmPackOf(docs.withColumn("lang", lit("en")),
      ctx = ctx, nShards = shards, patchBytes = 16L)
    // cost = text tokens + ceil(bytes/16) + 2 sentinels, recomputed in-row
    val base = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("tt"),
      ((octet_length(col("text")) + 15L) / lit(16L)).cast("long").as("np"))
    val bad = mm.join(base, Seq("doc_id"))
      .filter(col("mm_tok") =!= col("tt") + col("np") + 2L ||
        col("n_text_tok") =!= col("tt") || col("n_patches") =!= col("np"))
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
    assert(mm.filter(col("chunk_offset") >= ctx || col("chunk_offset") < 0).isEmpty)
    // chunk coordinates replay the per-shard running sum exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val re = mm.withColumn("cum", coalesce(sum("mm_tok").over(w), lit(0L)))
      .filter(col("chunk_id") =!= (col("cum") / ctx).cast("long") ||
        col("chunk_offset") =!= col("cum") % ctx)
    assert(re.isEmpty, re.collect().take(3).mkString(","))
  }
}
