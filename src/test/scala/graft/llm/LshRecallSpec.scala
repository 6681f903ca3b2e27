package graft.llm

import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Recall gate for the LSH candidate generation behind dedup_embed_lsh —
  * tested in the operator's design regime: genuinely near-duplicate
  * vectors (cosine ≥ 0.95), where banded random-hyperplane hashing must
  * recover nearly every true pair WITHOUT the O(n²) self-join. (The
  * driver's synthetic corpus tops out near cosine 0.5, where no
  * sub-quadratic method is probabilistically strong — hence this synthetic
  * fixture.) */
class LshRecallSpec extends graft.SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val nBase = 60

  test("LSH candidates recover >= 0.9 of true near-dup pairs (cosine >= 0.95)") {
    val rnd = new scala.util.Random(23)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // base vectors, each with a small-perturbation near-dup (ids i and i+nBase)
    val bases = Seq.fill(nBase)(unit())
    val dups = bases.map { b =>
      // per-dim sigma 0.03 -> perturbation norm ~0.24 -> cosine ~0.97
      val v = b.map(x => x + 0.03 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // plus unrelated noise vectors
    val noise = Seq.fill(nBase)(unit())
    val corpus = (bases ++ dups ++ noise).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

    // fixture sanity: the intended pairs really are near-dups
    val truePairs = corpus.as("a").join(corpus.as("b"),
        col("a.vec_id") + nBase === col("b.vec_id") && col("a.vec_id") < nBase)
      .select(col("a.vec_id").as("da"), col("b.vec_id").as("db"),
        DotProduct.cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= 0.95)
    val nTrue = truePairs.count()
    assert(nTrue >= nBase * 0.8, s"fixture produced only $nTrue high-cosine pairs")

    // production path: signature -> bands -> candidate pairs
    val cand = Similarity.lshCandidatePairs(
      Similarity.lshSignature(corpus), "vec_id")
    val recovered = truePairs.join(cand, Seq("da", "db"), "left_semi").count()
    val recall = recovered.toDouble / nTrue
    assert(recall >= 0.9, s"recall=$recall ($recovered of $nTrue)")

    // and the candidate set must be sub-quadratic: a small fraction of n²/2
    val n = corpus.count()
    assert(cand.count() < n * n / 10, s"candidate set is near-quadratic")
  }

  test("online ANN gate: a streamed near-dup embedding is flagged, noise is not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(43)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val corpusVecs = Seq.fill(40)(unit())
    val corpus = corpusVecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      .withColumn("norm2", graft.functions.DotProduct(col("embedding"), col("embedding")))
    val corpusBands = Similarity.lshBands(Similarity.lshSignature(corpus), "vec_id")

    // near-dup of corpus vec 0; plus an unrelated unit vector
    val nd = {
      val v = corpusVecs(0).map(x => x + 0.02 * rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = Similarity.annAgainstCorpus(
        in.toDF().toDF("vec_id", "embedding"), corpusBands, corpus)
      .writeStream.format("memory").queryName("anngate").outputMode("append").start()
    try {
      in.addData((500L, nd), (501L, unit()))
      q.processAllAvailable()
      val hits = spark.table("anngate").select("vec_id", "corpus_vec").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits.contains((500L, 0L)), s"near-dup embedding not flagged: $hits")
      assert(!hits.exists(_._1 == 501L), s"noise falsely flagged: $hits")
    } finally q.stop()
  }

  test("IVF recovers near-dup neighbors without the O(n*m) scan") {
    // same corpus layout written as an embeddings table; sim_ivf's
    // queries are vec_id < 20 (bases 0..19), whose near-dups are
    // vec_id + nBase. A near-identical pair lands in (or probes into)
    // the same coarse cell, so the dup must appear in the query's top-5.
    val rnd = new scala.util.Random(41)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val bases = Seq.fill(nBase)(unit())
    val dups = bases.map { b =>
      val v = b.map(x => x + 0.03 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val noise = Seq.fill(nBase)(unit())
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    (bases ++ dups ++ noise).zipWithIndex
      .map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = Similarity.simIvf(spark, dir)
      .filter(col("nid") === col("qid") + nBase)
      .count()
    // measured 20/20 with the 2-iteration Lloyd quantizer (deterministic
    // fixture); ≥19 leaves one probe-boundary case of slack while still
    // gating well above the seed-only quantizer's floor of 16
    assert(out >= 19, s"IVF recovered only $out of 20 near-dup pairs")
  }
}
