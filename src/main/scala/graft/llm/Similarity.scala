package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.operators.Common._

/** Similarity search over embedding columns (SURVEY.md §2.9 X3).
  *
  * Brute-force cosine top-k (the correctness baseline, oracle-gated) and a
  * random-hyperplane LSH bucketed variant (the 100 TB path: candidates
  * only join within matching signature buckets, turning O(n·m) into
  * O(Σ bucket²); recall is tested against brute force in ScalaTest).
  * Dot products run through the codegen'd [[graft.functions.DotProduct]]
  * expression — a tight primitive loop over the columnar float arrays, no
  * UDFs, no intermediate zipped arrays. Results are bit-identical to the
  * oracle's double-fold because floats widen to double before multiplying.
  */
object Similarity {

  private def withDoubleVec(df: DataFrame): DataFrame =
    df.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm2", DotProduct(col("embedding"), col("embedding")))

  /** X3: exact top-5 cosine neighbors for each query vector (vec_id < 20).
    * The query side is tiny → broadcast; one pass over the corpus, top-k
    * via per-query window. */
  val simTopk: Q = (s, d) => {
    val vecs = t(s, d, "embeddings")
      .withColumn("norm2", DotProduct(col("embedding"), col("embedding")))
    val q = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("norm2").as("qn"))
    val c = vecs.select(col("vec_id").as("nid"), col("embedding").as("nv"), col("norm2").as("nn"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("cosine",
        r4(DotProduct(col("qv"), col("nv")) / (sqrt(col("qn")) * sqrt(col("nn")))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "nid", "cosine")
      .orderBy("qid", "rnk")
  }

  /** Deterministic ±1 hyperplane — generated driver-side once, shipped as
    * an array literal, so the per-row work is one codegen'd DotProduct per
    * plane. The (plane, i) mix is a splitmix64-style finalizer: full
    * avalanche, so planes are statistically independent (a weaker linear
    * mix leaves consecutive planes correlated and inflates LSH bucket
    * collisions — caught by LshRecallSpec's sub-quadratic assertion). */
  private def plane(p: Int, dim: Int): Seq[Double] =
    Seq.tabulate(dim) { i =>
      var z = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH signatures: sign bits of dot products against
    * deterministic pseudo-random ±1 planes. Vectors sharing a signature
    * band land in the same bucket → candidate pairs without the full
    * self-join. Each sign bit is one [[DotProduct]] against a literal
    * plane array — a tight codegen'd loop, no interpreted lambdas (the
    * higher-order-function form evaluated planes·dim interpreted calls
    * per row). Exposed for ScalaTest recall checks and ANN queries. */
  def lshSignature(df: DataFrame, planes: Int = 48, dim: Int = 64): DataFrame = {
    val vcol = if (df.columns.contains("embedding")) col("embedding") else col("v")
    val bits = (0 until planes).map { p =>
      when(DotProduct(vcol, typedlit(plane(p, dim))) >= 0, 1).otherwise(0)
    }
    df.withColumn("sig", array(bits: _*))
      .withColumn("bucket", expr(
        "aggregate(sig, 0L, (acc, bit) -> acc * 2 + bit)"))
  }

  /** Band the signature bit-array into (band, bucket-hash) rows — pairs
    * sharing any band bucket become candidates (same trick as
    * MinHash/SimHash banding). Defaults (6 bands × 8 bits over 48 planes)
    * put a random pair's collision odds near 2% while catching ~99% of
    * cosine ≥ 0.95 pairs — measured in LshRecallSpec, which drives this
    * exact code path. Shared by dedup_embed_lsh. */
  def lshBands(sig: DataFrame, idCol: String, bands: Int = 6, bits: Int = 8): DataFrame =
    (0 until bands).map { b =>
      sig.select(col(idCol), lit(b).as("band"),
        expr(s"aggregate(slice(sig, ${b * bits + 1}, $bits), 0L, (acc, bit) -> acc * 2 + bit)")
          .as("bh"))
    }.reduce(_ unionByName _)

  /** Candidate pairs sharing any LSH band bucket. */
  def lshCandidatePairs(sig: DataFrame, idCol: String): DataFrame = {
    val bands = lshBands(sig, idCol)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("da"), col(s"y.$idCol").as("db"))
      .distinct()
  }

  /** LSH-bucketed near-neighbor candidates: pairs sharing a bucket. The
    * scale path for dedup_embed/sim_topk; correctness (recall vs brute
    * force) is ScalaTest-gated since bucket membership isn't
    * SQL-oracle-able across engines (Spark's murmur hash). */
  val simLshCandidates: Q = (s, d) => {
    val sig = lshSignature(t(s, d, "embeddings"))
    val a = sig.select(col("vec_id").as("da"), col("bucket"))
    val b = sig.select(col("vec_id").as("db"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("da") < col("db"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      .orderBy(desc("n_pairs"), asc("bucket"))
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    "sim_topk" -> simTopk,
    "sim_lsh_candidates" -> simLshCandidates)

  val oracle: Map[String, String] = Map(
    "sim_topk" ->
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           n AS (SELECT vec_id,
                        list_reduce([v[i] * v[i] for i in generate_series(1, len(v))],
                                    (x, y) -> x + y) AS norm2
                 FROM vecs),
           scored AS (
             SELECT q.vec_id AS qid, c.vec_id AS nid,
                    round(list_reduce([q.v[i] * c.v[i] for i in generate_series(1, len(q.v))],
                                      (x, y) -> x + y)
                          / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cosine
             FROM vecs q JOIN vecs c ON q.vec_id <> c.vec_id
             JOIN n nq ON nq.vec_id = q.vec_id
             JOIN n nc ON nc.vec_id = c.vec_id
             WHERE q.vec_id < 20)
         SELECT qid, rnk, nid, cosine
         FROM (SELECT qid, nid, cosine,
                      CAST(row_number() OVER (PARTITION BY qid
                                              ORDER BY cosine DESC, nid ASC) AS INT) AS rnk
               FROM scored)
         WHERE rnk <= 5 ORDER BY qid, rnk""")
}
