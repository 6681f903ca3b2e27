package graft.functions

import org.apache.spark.sql.functions._

/** Golden signatures and locality properties for the fingerprinting
  * expressions (the dedup_simhash correctness gate — the query itself is
  * rows-only at the driver because 64-bit wraparound FNV is not
  * DuckDB-expressible). */
class HashExpressionsSpec extends graft.SparkSpec {
  import spark.implicits._

  /** Independent Scala model of the FNV-1a 64 rolling hash. */
  private def fnv1a(s: String): Long = {
    var h = PolyHash64.Seed
    s.getBytes("UTF-8").foreach { b => h = (h ^ (b & 0xffL)) * PolyHash64.Prime }
    h
  }

  /** Model of the simhash bit-majority vote over token hashes. */
  private def simhashModel(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a(t)
      (0 until 64).foreach { b =>
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
      }
    }
    (0 until 64).foldLeft(0L) { (sig, b) => if (counts(b) > 0) sig | (1L << b) else sig }
  }

  test("PolyHash64 matches the FNV-1a model through codegen, incl. golden values") {
    val inputs = Seq("hello", "", "a", "the quick brown fox", "héllo ünïcode")
    val got = inputs.toDF("s").select(PolyHash64(col("s")).as("h")).collect()
    inputs.zip(got).foreach { case (s, row) =>
      assert(row.getLong(0) === fnv1a(s), s"PolyHash64($s)")
    }
    // pinned golden: the empty string hashes to the FNV offset basis
    assert(got(1).getLong(0) === PolyHash64.Seed)
  }

  test("SimHash64 matches the bit-majority model and skips null tokens") {
    val docs = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("lorem", "ipsum", "dolor"),
      Seq.empty[String])
    val got = docs.toDF("toks").select(SimHash64(col("toks")).as("sig")).collect()
    docs.zip(got).foreach { case (toks, row) =>
      assert(row.getLong(0) === simhashModel(toks), s"SimHash64($toks)")
    }
    // null tokens contribute nothing
    val withNull = Seq((Seq(Some("a"), None, Some("b")), Seq(Some("a"), Some("b"))))
      .toDF("x", "y")
      .select(SimHash64(col("x")).as("sx"), SimHash64(col("y")).as("sy")).head()
    assert(withNull.getLong(0) === withNull.getLong(1))
  }

  test("hamming locality: near-dup docs land within few bits, unrelated docs far") {
    val rnd = new scala.util.Random(7)
    def randTokens(n: Int) = Seq.fill(n)("tok" + rnd.nextInt(100000))
    val docs = Seq.fill(30)(randTokens(60))
    val nearDups = docs.map { d => d.updated(0, "CHANGED").updated(1, "ALSO") }
    val unrelated = Seq.fill(30)(randTokens(60))

    def ham(a: Seq[String], b: Seq[String]): Int =
      java.lang.Long.bitCount(simhashModel(a) ^ simhashModel(b))

    val nearMean = docs.zip(nearDups).map { case (a, b) => ham(a, b) }.sum / 30.0
    val farMean  = docs.zip(unrelated).map { case (a, b) => ham(a, b) }.sum / 30.0
    // 2/60 tokens changed: expect single-digit hamming; disjoint token
    // sets: expect ~32 (random bits)
    assert(nearMean < 10.0, s"nearMean=$nearMean")
    assert(farMean > 20.0, s"farMean=$farMean")
    assert(nearMean < farMean / 2)
  }

  test("hamming Column helper equals Long.bitCount of the XOR") {
    val pairs = Seq((0L, -1L), (5L, 6L), (Long.MinValue, Long.MaxValue), (42L, 42L))
    val got = pairs.toDF("a", "b")
      .select(SimHash64.hamming(col("a"), col("b")).as("h")).collect()
    pairs.zip(got).foreach { case ((a, b), row) =>
      assert(row.getInt(0) === java.lang.Long.bitCount(a ^ b))
    }
  }
}
