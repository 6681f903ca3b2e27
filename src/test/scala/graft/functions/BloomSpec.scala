package graft.functions

import org.apache.spark.sql.functions._

/** Bloom filter contracts: no false negatives ever, FPR near theory,
  * OR-merge associativity (partials == one pass), the stored-artifact
  * re-merge path, and the foldable-filter analysis-time guard. */
class BloomSpec extends graft.SparkSpec {
  import spark.implicits._

  private def theoreticalFpr(m: Int, k: Int, n: Int): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / m), k)

  test("no false negatives; false-positive rate tracks theory") {
    val rnd = new scala.util.Random(41)
    val members = Array.fill(20000)(rnd.nextLong())
    val f = new BloomFilter(1 << 18, 7) // ~13 bits/key → theory ≈ 0.2%
    members.foreach(f.add)
    assert(members.forall(f.mightContain), "Bloom false negative — broken filter")
    val probes = Array.fill(50000)(rnd.nextLong()).filterNot(members.contains)
    val fpr = probes.count(f.mightContain).toDouble / probes.length
    val bound = theoreticalFpr(1 << 18, 7, 20000) * 3 + 1e-4
    assert(fpr <= bound, s"fpr=$fpr exceeds 3x theory ($bound)")
  }

  test("partial filters OR-merge to exactly the one-pass filter") {
    val rnd = new scala.util.Random(43)
    val keys = Array.fill(10000)(rnd.nextLong())
    val whole = new BloomFilter(1 << 16, 5)
    keys.foreach(whole.add)
    val a = new BloomFilter(1 << 16, 5)
    val b = new BloomFilter(1 << 16, 5)
    keys.take(5000).foreach(a.add)
    keys.drop(5000).foreach(b.add)
    val merged = BloomFilter.deserialize(a.serialize())
      .merge(BloomFilter.deserialize(b.serialize()))
    // OR of bitsets is exact, not approximate: identical words
    assert(merged.serialize().sameElements(whole.serialize()))
  }

  test("distributed sketch + stored re-merge equals membership over the union") {
    val df = spark.range(0, 5000).select((col("id") * 37L).as("k"),
      (col("id") % 4).as("part"))
    // per-part stored artifacts, then BloomMergeAgg over the binaries
    val parts = df.groupBy("part").agg(BloomSketchAgg(col("k"), 1 << 16, 5).as("bf"))
    val remergedBytes = parts.agg(BloomMergeAgg(col("bf"), 1 << 16, 5).as("m"))
      .head().getAs[Array[Byte]](0)
    val f = BloomFilter.deserialize(remergedBytes)
    (0 until 5000).foreach(i => assert(f.mightContain(i * 37L)))
  }

  test("probe runs as a codegen'd literal; member rows all hit") {
    val members = spark.range(0, 1000).select((col("id") * 101L).as("k"))
    val bytes = members.agg(BloomSketchAgg(col("k"), 1 << 16, 5).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probed = spark.range(0, 2000)
      .select(col("id"), BloomMightContain(lit(bytes), col("id") * 101L).as("hit"))
    val plan = { probed.collect(); probed.queryExecution.executedPlan.toString }
    assert(plan.contains("*("), s"probe fell out of whole-stage codegen:\n$plan")
    assert(probed.filter(col("id") < 1000 && !col("hit")).count() == 0)
  }

  test("non-foldable filter column is rejected at analysis time") {
    val df = Seq((Array[Byte](1, 2, 3), 7L)).toDF("bf", "k")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(BloomMightContain(col("bf"), col("k"))).collect()
    }
  }

  test("null filter literal yields null results, not an NPE at planning") {
    // a foldable-but-null filter (e.g. a build over zero rows collected as
    // null) must flow through null propagation, never deserialize(null)
    val probed = spark.range(0, 10)
      .select(BloomMightContain(lit(null).cast("binary"), col("id")).as("hit"))
    assert(probed.collect().forall(_.isNullAt(0)))
  }
}
