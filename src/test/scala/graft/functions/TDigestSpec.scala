package graft.functions

import org.apache.spark.sql.functions._

/** The mergeable-percentile story (SURVEY §7.3): per-day t-digest sketches,
  * STORED as binary, merged across days, must agree with whole-corpus
  * quantiles within t-digest rank error. Rank error is the right metric —
  * a quantile estimate is correct iff the fraction of data at or below it
  * is close to q (value-space distance means nothing on skewed data). */
class TDigestSpec extends graft.SparkSpec {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], x: Double): Double = {
    val i = sorted.count(_ <= x)
    i.toDouble / sorted.length
  }

  test("local digest: rank error under 1% across the quantile range, tails tighter") {
    val rnd = new scala.util.Random(7)
    // lognormal-ish skew — the latency-shaped distribution t-digest exists for
    val xs = Array.fill(50000)(math.exp(rnd.nextGaussian() * 2.0))
    val d = new TDigest(100)
    xs.foreach(d.add)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err < 0.01, s"q=$q est=$est rank err $err")
    }
    for (q <- Seq(0.001, 0.999)) {
      val err = math.abs(rankOf(sorted, d.quantile(q)) - q)
      assert(err < 0.002, s"tail q=$q rank err $err")
    }
  }

  test("sketch bytes round-trip and the merge of halves equals one pass within rank error") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(20000)(rnd.nextDouble() * 1000.0)
    val whole = new TDigest(100)
    xs.foreach(whole.add)
    val a = new TDigest(100)
    val b = new TDigest(100)
    xs.take(10000).foreach(a.add)
    xs.drop(10000).foreach(b.add)
    val merged = TDigest.deserialize(a.serialize())
    merged.merge(TDigest.deserialize(b.serialize()))
    assert(math.abs(merged.totalWeight - 20000.0) < 1e-6)
    val sorted = xs.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val err = math.abs(rankOf(sorted, merged.quantile(q)) - q)
      assert(err < 0.015, s"merged q=$q rank err $err")
    }
  }

  test("null-keyed group survives the sketch-vs-exact validation join") {
    // GROUP BY keeps a NULL key as a real group; the validation join must
    // be null-safe (<=>) or that group silently disappears from the output
    val df = Seq((Option.empty[String], 1.0), (None, 2.0), (None, 3.0),
      (Some("a"), 10.0), (Some("a"), 20.0)).toDF("event_type", "value")
    val merged = df.groupBy("event_type")
      .agg(TDigestSketchAgg(col("value")).as("sk"))
      .select(col("event_type"), TDigestQuantile(col("sk"), 0.5).as("td50"))
    val exact = df.groupBy("event_type")
      .agg(min("value").as("mn"), max("value").as("mx"))
    val out = merged.as("m").join(exact.as("e"),
        col("m.event_type") <=> col("e.event_type"))
      .select(col("m.event_type").as("event_type"),
        (col("td50") >= col("mn") && col("td50") <= col("mx")).as("ok"))
      .collect()
    assert(out.length == 2, s"expected null + 'a' groups, got ${out.length}")
    assert(out.exists(_.isNullAt(0)), "null-keyed group was dropped")
    assert(out.forall(_.getBoolean(1)))
  }

  test("merge is associative within rank error: (a+b)+c vs a+(b+c)") {
    val rnd = new scala.util.Random(23)
    val xs = Array.fill(30000)(math.exp(rnd.nextGaussian()))
    val Seq(a1, b1, c1, a2, b2, c2) = Seq.fill(6)(new TDigest(100))
    val (ca, cb, cc) = (xs.slice(0, 10000), xs.slice(10000, 20000), xs.slice(20000, 30000))
    Seq(a1, a2).foreach(d => ca.foreach(d.add))
    Seq(b1, b2).foreach(d => cb.foreach(d.add))
    Seq(c1, c2).foreach(d => cc.foreach(d.add))
    val left = { a1.merge(b1); a1.merge(c1); a1 }   // (a+b)+c
    val right = { b2.merge(c2); a2.merge(b2); a2 }  // a+(b+c)
    assert(math.abs(left.totalWeight - right.totalWeight) < 1e-6)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val dl = rankOf(sorted, left.quantile(q))
      val dr = rankOf(sorted, right.quantile(q))
      assert(math.abs(dl - q) < 0.015 && math.abs(dr - q) < 0.015,
        s"q=$q left-rank=$dl right-rank=$dr")
    }
  }

  test("TDigestQuantile rejects a non-binary sketch column at analysis time") {
    val df = Seq((1, 2.0)).toDF("k", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TDigestQuantile(col("v"), 0.5)).collect()
    }
  }

  test("per-day sketches stored, re-merged across days == whole-corpus percentile") {
    val d = "/root/testdata/sf0.01"
    val ev = graft.Tables.t(spark, d, "events")
      .select(to_date(col("ts")).as("day"), col("value"))
    // daily rollup: one binary sketch per day (the storable artifact)
    val daily = ev.groupBy("day").agg(TDigestSketchAgg(col("value")).as("sketch"))
    assert(daily.count() > 1, "need multiple days for the re-merge to mean anything")
    // cross-day re-merge from the STORED sketches only
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val remerged = daily.agg(TDigestMergeAgg(col("sketch")).as("m"))
      .select(qs.map(q => TDigestQuantile(col("m"), q).as(s"q$q")): _*)
      .head()
    val values = ev.select("value").as[Double].collect().sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val est = remerged.getDouble(i)
      val err = math.abs(rankOf(values, est) - q)
      assert(err < 0.01, s"re-merged q=$q est=$est rank err $err")
    }
  }
}
