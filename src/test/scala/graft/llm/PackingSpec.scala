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
}
