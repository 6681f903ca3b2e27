package graft.llm

import org.apache.spark.sql.functions._

/** Invariant + plan gates for the corpus-level training-data operators
  * added in round 12: semantic dedup (cluster-then-prune), KMV
  * cross-source overlap, the per-source quality percentile gate, and
  * token-budget sampling. The DuckDB oracle pins each key's exact output;
  * this spec pins the CLAIMS the outputs must satisfy (decision-rule
  * invariants) and the plan shapes the 100 TB story depends on. */
class CorpusOpsSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(key: String) = graft.SparkEntry.queries(key)(spark, sf)

  // ---- sim_semantic_dedup ----

  test("semantic dedup drops only toward smaller ids at cosine >= tau") {
    val rows = run("sim_semantic_dedup")
      .select("cid", "vec_id", "dup_of", "cosine").collect()
    assert(rows.nonEmpty, "no drops at sf0.001 — tau miscalibrated for corpus")
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1), s"dup_of must be a smaller id: $r")
      assert(r.getDouble(3) >= 0.35, s"kept a pair below tau: $r")
    }
    // keep-rule sanity: a vector is dropped at most once (one row per id)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length)
  }

  test("semantic dedup joins within clusters — never a cartesian pair scan") {
    val p = run("sim_semantic_dedup").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the member self-join must key on cid (cluster-local pairs)
    assert(p.contains("cid"), p)
  }

  test("semantic dedup drop set is consistent with the IVF assignment") {
    // every (cid, vec_id) in the drop list must be a real cluster member
    // pair: re-derive membership from the census path's assignment by
    // checking the drop's cid exists and holds >= 2 vectors
    val census = run("sim_ivf_census").select("cid", "n_vecs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("sim_semantic_dedup").select("cid").distinct().collect().foreach { r =>
      val cid = r.getLong(0)
      assert(census.getOrElse(cid, 0L) >= 2L,
        s"drop in cluster $cid which holds < 2 members")
    }
  }

  // ---- dedup_corpus_overlap ----

  test("corpus overlap emits one estimate per unordered source pair in [0,1]") {
    val rows = run("dedup_corpus_overlap")
      .select("src_a", "src_b", "n_common", "jaccard_est").collect()
    val nSrc = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      s"expected C($nSrc,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), s"pair not canonicalized: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"est out of range: $r")
      assert(r.getLong(2) <= 128L, s"n_common exceeds sketch size K: $r")
    }
  }

  test("corpus overlap estimate tracks true Jaccard on a constructed overlap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    // two sources sharing exactly half their shingle space: texts are
    // 5-word windows over a shared vocab run vs a disjoint run
    def doc(src: String, id: Long, words: Seq[String]) =
      (id, words.mkString(" "), "en", src, words.mkString(" ").length.toLong)
    val shared = (0 until 300).map(i => s"s$i")
    val aOnly = (0 until 300).map(i => s"a$i")
    val bOnly = (0 until 300).map(i => s"b$i")
    val docs = Seq(
      doc("srcA", 1L, shared), doc("srcA", 2L, aOnly),
      doc("srcB", 3L, shared), doc("srcB", 4L, bOnly))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val est = graft.SparkEntry.queries("dedup_corpus_overlap")(spark, dir)
      .select("jaccard_est").head().getDouble(0)
    // true Jaccard of the shingle sets is ~ (298) / (298*3 + 2*2) ≈ 0.33
    assert(est > 0.2 && est < 0.5, s"KMV estimate $est far from truth ~0.33")
  }

  // ---- text_quality_filter ----

  test("quality filter keeps at most half of each source, the lowest-nll half") {
    val kept = run("text_quality_filter").select("source", "doc_id", "nll").collect()
    assert(kept.nonEmpty)
    val bySrc = kept.groupBy(_.getString(0))
    val totals = graft.operators.Common.t(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, rows) =>
      assert(rows.length <= totals(src) / 2 + 1,
        s"$src kept ${rows.length} of ${totals(src)}")
    }
  }

  // ---- text_token_budget ----

  test("token budget never overruns a shard quota and fills monotonically") {
    val rows = run("text_token_budget")
      .select("source", "shard", "doc_id", "n_tok", "cum_tok").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(4) <= 300L, s"quota overrun: $r"))
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
      // within a shard the kept docs' cumulative sums are distinct and
      // each equals the running sum of kept n_tok (no gaps below quota)
      val sorted = rs.sortBy(_.getLong(4))
      val runningSums = sorted.scanLeft(0L)(_ + _.getLong(3)).drop(1)
      assert(sorted.map(_.getLong(4)).sameElements(runningSums),
        s"cumulative fill has gaps: ${sorted.mkString(";")}")
    }
  }

  // ---- pipeline_corpus_quality ----

  test("quality-gated pipeline halves the corpus reaching dedup") {
    val plain = run("pipeline_corpus").count()
    val gated = run("pipeline_corpus_quality").count()
    assert(gated > 0 && gated < plain,
      s"gated $gated vs plain $plain — the X4i stage should cut the input")
  }

  // ---- text_bpe_merges ----

  test("BPE merges shrink the symbol count by exactly the merge count") {
    val rows = run("text_bpe_merges")
      .select("step", "left_sym", "right_sym", "n_pair", "n_symbols").collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 3)
    // symbol count strictly decreases; each round removes at most n_pair
    // symbols (exactly n_pair when the merged pair never self-overlaps)
    rows.sliding(2).foreach { case Array(a, b) =>
      val removed = a.getLong(4) - b.getLong(4)
      assert(removed > 0 && removed <= b.getLong(3),
        s"step ${b.getInt(0)} removed $removed vs n_pair ${b.getLong(3)}")
    }
  }

  test("BPE learns hierarchical merges on a constructed corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // 'abc' dominates: round 1 must merge (a,b) (tie with (b,c) broken
    // lexicographically), round 2 must merge the NEW symbol (ab, c) —
    // proving merged symbols re-enter the pair statistics
    val text = Seq.fill(50)("abc").mkString(" ") + " xy xy xy"
    Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("text_bpe_merges")(spark, dir)
      .select("step", "left_sym", "right_sym", "n_pair").collect()
      .sortBy(_.getInt(0))
    assert(rows(0).getString(1) == "a" && rows(0).getString(2) == "b"
      && rows(0).getLong(3) == 50L, s"round 1: ${rows(0)}")
    assert(rows(1).getString(1) == "ab" && rows(1).getString(2) == "c"
      && rows(1).getLong(3) == 50L, s"round 2: ${rows(1)}")
    assert(rows(2).getString(1) == "x" && rows(2).getString(2) == "y"
      && rows(2).getLong(3) == 3L, s"round 3: ${rows(2)}")
  }

  test("BPE merge budget beyond exhaustion degrades to identity rounds") {
    import spark.implicits._
    // 'abc'×50 + 'xy'×3: exactly 3 merges exist ((a,b), (ab,c), (x,y));
    // asking for 5 must return 3 rows, not crash or emit junk rules
    val text = Seq.fill(50)("abc").mkString(" ") + " xy xy xy"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = TextOps.bpeMergesOf(docs, nMerges = 5).collect()
    assert(rows.length == 3, rows.mkString(";"))
  }

  test("BPE encode tokenizes with the trained vocabulary") {
    val rows = run("text_bpe_encode")
      .select("doc_id", "n_words", "n_bpe", "bpe_md5").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // symbols can never be fewer than words (a word is >= 1 symbol)
      assert(r.getLong(2) >= r.getLong(1), s"n_bpe < n_words: $r")
      assert(r.getString(3).length == 32, s"md5 shape: $r")
    }
  }

  // ---- text_source_kl ----

  test("source KL is non-negative and flags an off-distribution source") {
    val rows = run("text_source_kl").select("source", "n_tok", "kl").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0, s"KL must be >= 0: $r"))
  }

  test("a constructed off-distribution source dominates the KL ranking") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kl").toString
    val rnd = new scala.util.Random(7)
    // three sources drawing from the same vocab, one from a disjoint one
    def doc(src: String, id: Long, vocab: Int => String) = {
      val words = Seq.fill(50)(vocab(rnd.nextInt(40)))
      (id, words.mkString(" "), "en", src, words.mkString(" ").length.toLong)
    }
    val docs = ((0 until 9).map { i =>
      doc(s"in${i % 3}", i.toLong, k => s"w$k")
    } ++ (9 until 12).map { i =>
      doc("outlier", i.toLong, k => s"z$k")
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl = graft.SparkEntry.queries("text_source_kl")(spark, dir)
      .select("source", "kl").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val inMax = kl.filter(_._1.startsWith("in")).values.max
    assert(kl("outlier") > inMax + 0.5,
      s"outlier KL ${kl("outlier")} should dominate in-distribution max $inMax")
  }

  test("token budget windows partition by (source, shard) — no global sort") {
    val p = run("text_token_budget").queryExecution.executedPlan.toString
    // the only Exchange below the window must be hash partitioning on
    // source+shard, not a single-partition global exchange
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  // ---- text_dsir ----

  test("dsir selection flag is exactly the sign of the rounded weight") {
    val rows = run("text_dsir").select("dsir_w", "selected").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) == (r.getDouble(0) > 0.0),
        s"selected must be dsir_w > 0: $r")
    }
  }

  test("dsir separates target-language docs on a constructed corpus") {
    import spark.implicits._
    // en docs draw bigrams from vocab A, fr docs from disjoint vocab B:
    // the likelihood ratio (target=en over raw) must be positive for
    // every en doc and negative for every fr doc
    val rnd = new scala.util.Random(11)
    def doc(id: Long, lang: String, pfx: String) = {
      val words = Seq.fill(60)(s"$pfx${rnd.nextInt(30)}")
      (id, words.mkString(" "), lang, "web", 0L)
    }
    val docs = ((0 until 8).map(i => doc(i.toLong, "en", "w")) ++
      (8 until 16).map(i => doc(i.toLong, "fr", "z")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val byLang = TextOps.dsirOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (0 until 8).foreach(i => assert(byLang(i.toLong) > 0.0,
      s"en doc $i should have positive dsir weight, got ${byLang(i.toLong)}"))
    (8 until 16).foreach(i => assert(byLang(i.toLong) < 0.0,
      s"fr doc $i should have negative dsir weight, got ${byLang(i.toLong)}"))
  }

  test("dsir broadcasts the 128-row ratio table — no shuffle join on docs") {
    val p = run("text_dsir").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"ratio table must broadcast onto the feature stream:\n$p")
    // the doc-side feature stream must never sort-merge against the
    // KB-scale model — that would shuffle the whole corpus on bucket id
    assert(!p.contains("SortMergeJoin"), p)
  }
}
