package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scheduler paths once so the first timed query
    // doesn't absorb session startup (it was inflating whichever query
    // happened to iterate first by multiple seconds).
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.t(spark, sfDir, "region").count()
    val sfName = new java.io.File(sfDir).getName
    // ALL machine-parsed number formatting goes through Locale.ROOT: the
    // plain f-interpolator uses the JVM default locale, and under a
    // comma-decimal locale every JSON fragment / anchor line / BASELINE row
    // written here would silently corrupt the cross-round record.
    def d1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def d2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def d3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Prior run's per-query times (same sf only) — loaded BEFORE timing so
    // that variance-flagged queries can escalate reps inline instead of
    // merely being reported after the fact. Round-11 verdict: a single
    // contended sample became the official artifact at 1.99× the gate;
    // min-of-N with escalation measures the plan, not the weather.
    val prevTimes: Map[String, Double] =
      try {
        val prevPath = java.nio.file.Paths.get("bench_full.json")
        if (java.nio.file.Files.exists(prevPath)) {
          val prev = java.nio.file.Files.readString(prevPath)
          if (prev.contains(s""""sf":"$sfName"""")) {
            // Parse ONLY the "queries" object: the sidecar also carries a
            // reps_escalated map whose integer values would otherwise
            // shadow the times (same key names, later match wins in toMap).
            val qobj = prev.indexOf(""""queries":{""") match {
              case -1 => ""
              case i =>
                val start = i + """"queries":{""".length
                prev.substring(start, prev.indexOf('}', start).max(start))
            }
            val entry = """"([a-z0-9_]+)":([0-9.]+)""".r
            entry.findAllMatchIn(qobj)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          } else Map.empty[String, Double]
        } else Map.empty[String, Double]
      } catch { case _: Throwable => Map.empty[String, Double] }
    // FIXED cross-round anchor (round-14 verdict gap #4): the closest-row
    // gate below ratchets against the most recent comparable record, so a
    // slow per-round drift could accumulate invisibly across many rounds.
    // BENCH_ANCHOR.json pins every key's FIRST quiet measurement forever
    // (append-only — entries are never re-timed). Parsed BEFORE timing so
    // per-key violations can trigger an inline quiet re-measure (below).
    // Entries keep their VERBATIM number text (anchorTexts) so the append
    // path can rewrite the file without re-rounding frozen history.
    val anchorPath = java.nio.file.Paths.get("BENCH_ANCHOR.json")
    val anchorRaw: String =
      try {
        if (java.nio.file.Files.exists(anchorPath))
          java.nio.file.Files.readString(anchorPath)
        else ""
      } catch { case _: Throwable => "" }
    val anchorTexts: Seq[(String, String)] =
      try {
        if (anchorRaw.contains(s""""sf": "$sfName"""") ||
            anchorRaw.contains(s""""sf":"$sfName"""")) {
          val entry = """"([a-z0-9_]+)":\s*([0-9.]+)""".r
          entry.findAllMatchIn(
            anchorRaw.substring(anchorRaw.indexOf("\"queries\"").max(0)))
            .map(m => m.group(1) -> m.group(2)).toSeq
        } else Seq.empty
      } catch { case _: Throwable => Seq.empty }
    val anchor: Map[String, Double] =
      anchorTexts.map { case (k, t) => k -> t.toDouble }.toMap
    // A failing query must fail the bench VISIBLY: record its error, keep
    // timing the rest, and exit non-zero at the end (no -1L masking).
    // Each query is timed `reps` times and reports the MIN: single-shot
    // timings on this sandbox swing up to ~2× (first-execution codegen +
    // neighbor noise); min-of-2 measures the plan, not the weather. When
    // the min still sits >3× the previous sidecar's time for the same
    // query (the documented noise band is ~2×), the query gets up to
    // `extraReps` more runs — a noisy window then costs extra samples, not
    // a contaminated official artifact.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val extraReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_REPS", "2").toInt
    // Key filter for STANDALONE quiet re-measures (the per-key anchor
    // gate's retry discipline): a filtered run times only the named keys
    // and SKIPS every permanent record (bench_full.json, anchor append,
    // BASELINE.md) — partial runs must never masquerade as full ones.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val repsUsed = scala.collection.mutable.LinkedHashMap[String, Int]()
    val results0 = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var best = Double.MaxValue
      var rep = 0
      def runOnce(): Unit = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        rep += 1
      }
      while (rep < reps && !errors.contains(name)) runOnce()
      // Escalate: only meaningful when a prior quiet time exists and was
      // itself non-trivial (>=0.15s keeps sub-100ms jitter from triggering).
      def flagged: Boolean =
        prevTimes.get(name).exists(pv => pv >= 0.15 && best > 3 * pv)
      var extra = 0
      while (flagged && extra < extraReps && !errors.contains(name)) {
        runOnce(); extra += 1
      }
      repsUsed(name) = rep
      name -> best
    }
    // PER-KEY anchor gate (round-15 order #2): the aggregate anchor ratio
    // hides a single 10× key inside a 319-key sum (~3% movement), so every
    // shared key is also compared against its own frozen first-green time.
    // Two clauses (round-17 verdict #1b): the noise band (>2× AND >+1 s —
    // sub-second keys jitter past 2× on this sandbox) AND a RATIO-ONLY
    // escalation (≥3× anchor regardless of absolute delta, anchors ≥50 ms)
    // — the r17 close let 22 sub-second keys drift past 2× because every
    // one escaped the delta clause. Each violator gets ONE quiet re-measure
    // before being flagged — by this point the fleet has drained, so the
    // retry is the "standalone re-measure" that exonerated sim_sq8_gate in
    // r14/r15 by hand; a genuine plan regression survives the retry.
    def keyViolates(k: String, v: Double): Boolean =
      anchor.get(k).exists(a =>
        (v > 2 * a && v - a > 1.0) || (a >= 0.05 && v >= 3 * a))
    val retried = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results: Map[String, Double] = results0.map { case (k, v) =>
      if (keyViolates(k, v) && !errors.contains(k)) {
        val t0 = System.nanoTime()
        try { SparkEntry.queries(k)(spark, sfDir).count() } catch { case _: Throwable => () }
        val again = (System.nanoTime() - t0) / 1e9
        retried(k) = math.min(v, again)
        k -> math.min(v, again)
      } else k -> v
    }
    val violations: Seq[(String, Double, Double)] = results.toSeq.collect {
      case (k, v) if keyViolates(k, v) && !errors.contains(k) =>
        (k, anchor(k), v)
    }.sortBy { case (_, a, v) => -(v / a) }
    // Compact per-query timings to 3 decimals: the driver parses the JSON
    // line out of a bounded TAIL of stdout (last ~2000 chars) — round 3's
    // full-precision doubles pushed the line past that window and the
    // driver recorded parsed:null despite rc=0. Millisecond resolution is
    // plenty for the 2× gate.
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def gitRev: String =
      try {
        val h = java.nio.file.Files
          .readString(java.nio.file.Paths.get(".git/HEAD")).trim
        (if (h.startsWith("ref: "))
           java.nio.file.Files.readString(
             java.nio.file.Paths.get(".git/" + h.drop(5))).trim
         else h).take(7)
      } catch { case _: Throwable => "unknown" }
    // The 2×-vs-baseline gate, computed HERE instead of by judge/builder
    // arithmetic: find the prior [auto] BASELINE.md row at this sf whose
    // query count is closest to this run's (most recent wins ties,
    // excluding this tree's own row), and compare PER-QUERY mean time —
    // like-for-like even while the surface grows. The verdict's gate is
    // "within 2× of the recorded baseline"; ratio > 2 fails loudly in
    // both the stdout JSON and stderr.
    val gate: Option[(String, Int, Double, Double)] =
      try {
        val sfNum = sfName.stripPrefix("sf")
        val row = ("""\| \d{4}-\d{2}-\d{2} \| ([0-9a-f]{7}) \| """ +
          java.util.regex.Pattern.quote(sfNum) +
          """ \| ([0-9.]+) \| \[auto\] (\d+) queries""").r
        val rev = gitRev
        val rows = java.nio.file.Files
          .readAllLines(java.nio.file.Paths.get("BASELINE.md"))
          .toArray.toSeq.map(_.toString)
          .flatMap(l => row.findFirstMatchIn(l))
          .map(m => (m.group(1), m.group(3).toInt, m.group(2).toDouble))
          .filter(_._1 != rev)
        if (rows.isEmpty || results.isEmpty) None
        else {
          val (pRev, pN, pTotal) = rows.zipWithIndex
            .minBy { case ((_, n, _), i) =>
              (math.abs(n - results.size), -i) }._1
          val perQ = (total / results.size) / (pTotal / pN)
          Some((pRev, pN, pTotal, perQ))
        }
      } catch { case _: Throwable => None }
    // Gate vs the previous ROUND-CLOSE artifact too (round-17 verdict #1c):
    // the closest-row gate above can end up comparing against this round's
    // own worst intermediate run, which flatters the trend. The highest
    // BENCH_r{N}.json in the repo is the prior round's official close; its
    // per-query cost is recorded alongside so a round can't look faster by
    // racing its own contended runs. Informational (stderr + JSON), not a
    // pass/fail — the anchors are the binding record.
    val prevClose: Option[(String, Int, Double)] =
      try {
        val dir = new java.io.File(".")
        val rFile = """BENCH_r(\d+)\.json""".r
        val closes = dir.listFiles.toSeq.flatMap { f =>
          f.getName match {
            case rFile(n) => Some((n.toInt, f))
            case _        => None
          }
        }.sortBy(-_._1)
        closes.view.flatMap { case (n, f) =>
          // the driver wrapper embeds the bench stdout line as an escaped
          // JSON string — un-escape before matching
          val txt = java.nio.file.Files.readString(f.toPath)
            .replace("\\\"", "\"")
          val v = """"metric":"total","value":([0-9.]+)""".r
            .findFirstMatchIn(txt).map(_.group(1).toDouble)
          val q = """"n_queries":(\d+)""".r
            .findFirstMatchIn(txt).map(_.group(1).toInt)
          val sfOk = txt.contains(s""""sf": ${sfName.stripPrefix("sf")}""") ||
            txt.contains(s""""sf":"$sfName"""")
          if (sfOk) v.zip(q).map { case (vv, qq) => (s"r$n", qq, vv) }
          else None
        }.headOption
      } catch { case _: Throwable => None }
    val prevCloseJson = prevClose.filter(_ => results.nonEmpty)
      .map { case (r, pN, pTotal) =>
        val perQ = (total / results.size) / (pTotal / pN)
        s""","prev_close":{"vs":"$r/${pN}q/${d1(pTotal)}s","per_query_ratio":${d2(perQ)}}"""
      }.getOrElse("")
    prevClose.filter(_ => results.nonEmpty).foreach { case (r, pN, pTotal) =>
      val perQ = (total / results.size) / (pTotal / pN)
      System.err.println(
        f"[bench] PREV-CLOSE: per-query ratio $perQ%.2fx vs $r " +
          f"($pN queries, $pTotal%.1fs)")
    }
    val gateJson = gate.map { case (pRev, pN, pTotal, perQ) =>
      s""","gate":{"vs":"$pRev/${pN}q/${d1(pTotal)}s","per_query_ratio":${d2(perQ)},"pass":${perQ <= 2.0}}"""
    }.getOrElse("") + prevCloseJson
    gate.foreach { case (pRev, pN, pTotal, perQ) =>
      System.err.println(
        f"[bench] GATE ${if (perQ <= 2.0) "PASS" else "FAIL"}: " +
          f"per-query ratio $perQ%.2fx vs $pRev ($pN queries, $pTotal%.1fs)")
    }
    // Aggregate anchor gate (parsed up top, before timing) + the per-key
    // violations list (round-15 order #2). `pass` requires BOTH: aggregate
    // ratio <= 2 AND zero per-key violations — a single 10× key can no
    // longer hide inside the sum. Violations ride in the stdout JSON
    // (capped at 5 for the line budget; the full list is in
    // bench_full.json via the same fragment) and on stderr.
    val anchorGate: Option[(Int, Double, Double)] = {
      val shared = results.keySet.intersect(anchor.keySet)
      if (shared.isEmpty) None
      else {
        val cur = shared.toSeq.map(results).sum
        val anc = shared.toSeq.map(anchor).sum
        Some((shared.size, anc, cur))
      }
    }
    val violJson =
      if (violations.isEmpty) """"violations":[]"""
      else {
        val shown = violations.take(5).map { case (k, a, v) =>
          s"""{"q":"$k","anchor":${d2(a)},"now":${d2(v)},"ratio":${d1(v / a)}}"""
        }.mkString("[", ",", "]")
        val more = if (violations.size > 5)
          s""","violations_omitted":${violations.size - 5}""" else ""
        s""""violations":$shown$more"""
      }
    val anchorJson = anchorGate.map { case (n, anc, cur) =>
      val pass = cur / anc <= 2.0 && violations.isEmpty
      s""","anchor":{"n_shared":$n,"anchor_s":${d1(anc)},"now_s":${d1(cur)},"ratio":${d2(cur / anc)},$violJson,"pass":$pass}"""
    }.getOrElse("")
    anchorGate.foreach { case (n, anc, cur) =>
      val r = cur / anc
      val pass = r <= 2.0 && violations.isEmpty
      System.err.println(
        f"[bench] ANCHOR ${if (pass) "PASS" else "FAIL"}: $n shared keys " +
          f"$anc%.1fs at first-green -> $cur%.1fs now ($r%.2fx), " +
          s"${violations.size} per-key violations (${retried.size} retried quiet)")
      violations.foreach { case (k, a, v) =>
        System.err.println(
          f"[bench] ANCHOR-KEY $k: $a%.2fs at first-green -> $v%.2fs now " +
            f"(${v / a}%.1fx, survived quiet retry) - plan regression or " +
            "persistent contention, read the plan")
      }
    }
    // The driver parses this line out of a BOUNDED tail of stdout: the
    // last 2000 chars, which must also hold sbt's ~75-char [success]
    // trailer — so the line budget is ~1920 chars. Precision degrades
    // (2 → 1 → 0 decimals, trailing zeros stripped) before the line can
    // ever overflow; the untruncated 3-decimal JSON is also written to
    // bench_full.json for human/judge consumption.
    // Round 7 lesson: with 113 queries even line(0) exceeds the driver's
    // tail window, so BENCH_r07 recorded parsed:null despite rc=0. When
    // precision degradation alone can't fit the line, shrink the stdout
    // map to the top-K costliest queries (they're what the 2× gate cares
    // about) and say how many cheap ones were elided; bench_full.json
    // always carries all of them at 3 decimals.
    def line(dec: Int, topK: Int, withReps: Boolean = false): String = {
      def sec(v: Double) = s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
        .replaceAll("(\\.\\d*?)0+$", "$1").replaceAll("\\.$", "")
      val kept =
        if (topK >= results.size) results.toSeq
        else results.toSeq.sortBy(-_._2).take(topK)
      val omitted =
        if (kept.size == results.size) ""
        else s""","queries_omitted":${results.size - kept.size}"""
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + sec(v) }
        .mkString("{", ",", "}")
      // reps-used map rides only in the sidecar (stdout line budget is
      // tight); escalated queries are the ones with reps > base.
      val repsJson =
        if (!withReps) ""
        else repsUsed.filter(_._2 > reps)
          .map { case (k, v) => "\"" + k + "\":" + v }
          .mkString(""","reps_escalated":{""", ",", "}")
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"queries":$qs$omitted,"errors":$errJson$repsJson$gateJson$anchorJson,"sf":"$sfName"}"""
    }
    // Variance reporting (post-escalation): anything STILL >3× after the
    // extra reps is worth reading as a possible plan regression; big
    // downward moves are logged too (they reset the sidecar floor).
    // stderr-only: the driver's stdout JSON contract is untouched.
    results.foreach { case (k, v) =>
      prevTimes.get(k).filter(_ >= 0.15).foreach { pv =>
        if (v > 3 * pv || (v >= 0.15 && pv > 3 * v)) {
          val esc = repsUsed.getOrElse(k, reps)
          System.err.println(
            f"[bench] VARIANCE $k: $pv%.2fs -> $v%.2fs (${v / pv}%.1fx, $esc reps) on " +
              "this tree - contention or regression, re-measure standalone")
        }
      }
    }
    try {
      if (only.isEmpty) java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"),
        line(3, Int.MaxValue, withReps = true) + "\n")
    } catch { case _: Throwable => () } // sidecar is best-effort
    // Anchor maintenance: keys not yet in BENCH_ANCHOR.json get frozen at
    // this run's time (their first clean measurement); existing entries
    // are NEVER rewritten — their VERBATIM number text (anchorTexts) is
    // carried through, never re-parsed-and-re-rounded. The write ABORTS
    // if the strict key regex parsed fewer entries than the file's
    // queries block visibly holds (a corrupted/nonconforming entry must
    // never be silently dropped from the permanent record). Only runs at
    // the anchor's own sf with zero errors touch the file, so a local
    // sf0.01 iteration loop or a failing tree can't pollute it.
    try {
      if (only.isEmpty && errors.isEmpty && anchorTexts.nonEmpty &&
          results.exists { case (k, _) => !anchor.contains(k) }) {
        val qBlock = anchorRaw.substring(anchorRaw.indexOf("\"queries\"").max(0))
        val looseCount = """"[^"\n]+"\s*:""".r.findAllIn(qBlock).size
        // strict entries + 1 for the "queries" label itself
        if (looseCount != anchorTexts.size + 1)
          System.err.println(s"[bench] ANCHOR WRITE ABORTED: strict parse " +
            s"${anchorTexts.size} entries vs $looseCount key tokens in file " +
            "- fix BENCH_ANCHOR.json by hand, not by lossy rewrite")
        else {
          val comment = """(?s)"comment":\s*"((?:[^"\\]|\\.)*)"""".r
            .findFirstMatchIn(anchorRaw).map(_.group(1)).getOrElse("")
          // The annotated re-record block (r16 verdict #3): when a stale
          // anchor is re-frozen by hand, its OLD entry moves into
          // "superseded" (placed BEFORE "queries" so neither the anchor
          // parse nor the strict-count audit sees it). Carried through
          // every rewrite VERBATIM — history is appended, never erased.
          // Extracted by a brace-balanced, string-aware scan (a regex
          // cannot match nested braces, and a brace inside a note string
          // would silently erase the block — round-17 ADVICE); if the
          // label is present but no balanced block follows, the write
          // ABORTS loudly like the strict-count check above.
          val supIdx = anchorRaw.indexOf("\"superseded\"")
          val superseded: Option[String] =
            if (supIdx < 0) Some("")
            else {
              val open = anchorRaw.indexOf('{', supIdx)
              var i = open; var depth = 0; var inStr = false; var esc = false
              var end = -1
              while (open >= 0 && i < anchorRaw.length && end < 0) {
                val c = anchorRaw.charAt(i)
                if (esc) esc = false
                else if (inStr) {
                  if (c == '\\') esc = true
                  else if (c == '"') inStr = false
                } else c match {
                  case '"' => inStr = true
                  case '{' => depth += 1
                  case '}' => depth -= 1; if (depth == 0) end = i
                  case _   => ()
                }
                i += 1
              }
              if (end < 0) None
              else Some(anchorRaw.substring(supIdx, end + 1) + ",\n")
            }
          superseded match {
            case None =>
              System.err.println("[bench] ANCHOR WRITE ABORTED: " +
                "'superseded' present but no brace-balanced block found " +
                "- fix BENCH_ANCHOR.json by hand, not by lossy rewrite")
            case Some(sup) =>
              val newKeys = results.toSeq
                .filter { case (k, _) => !anchor.contains(k) }
                .map { case (k, v) => k -> d3(v) }
              val body = (anchorTexts ++ newKeys).sortBy(_._1).map { case (k, t) =>
                s""""$k": $t"""
              }.mkString(",\n")
              java.nio.file.Files.writeString(anchorPath,
                s"""{\n"comment": "$comment",\n"sf": "$sfName",\n$sup"queries": {\n$body\n}\n}\n""")
          }
        }
      }
    } catch { case _: Throwable => () } // anchor append is best-effort
    // Machine-append the BASELINE.md narrative row (round-11 verdict: the
    // manual record drifted from the artifact). Rows carry an [auto] marker;
    // re-running the same tree at the same sf REPLACES its [auto] row only
    // when the new total is LOWER — the documented best-of-runs policy is
    // now enforced by code, so a contended re-run can never overwrite a
    // quiet record and hand-written narrative rows are never touched.
    try {
      val baseline = java.nio.file.Paths.get("BASELINE.md")
      if (only.isEmpty && java.nio.file.Files.exists(baseline) && errors.isEmpty) {
        val rev = gitRev
        val sfNum = sfName.stripPrefix("sf")
        val top = results.toSeq.sortBy(-_._2).take(5)
          .map { case (k, v) => s"$k ${d1(v)}" }.mkString(", ")
        val escNote =
          if (repsUsed.exists(_._2 > reps))
            s"; escalated: ${repsUsed.filter(_._2 > reps).keys.mkString(",")}"
          else "; 0 escalated"
        val row = s"| ${java.time.LocalDate.now} | $rev | $sfNum | ${d1(total)} " +
          s"| [auto] ${results.size} queries, min-of-$reps + variance " +
          s"escalation$escNote; top: $top |"
        val lines = java.nio.file.Files.readAllLines(baseline)
        val key = s"| $rev | $sfNum |"
        val existing = (0 until lines.size).find { i =>
          val l = lines.get(i)
          l.contains("[auto]") && l.contains(key) &&
            l.contains(s" ${results.size} queries")
        }
        existing match {
          case Some(i) =>
            val prevTotal = """\| ([0-9.]+) \| \[auto\]""".r
              .findFirstMatchIn(lines.get(i)).map(_.group(1).toDouble)
            if (prevTotal.forall(total < _)) {
              lines.set(i, row)
              java.nio.file.Files.write(baseline, lines)
            } // else: a better (lower) record for this tree already stands
          case None =>
            java.nio.file.Files.writeString(baseline,
              String.join("\n", lines) + "\n" + row + "\n")
        }
      }
    } catch { case _: Throwable => () } // narrative append is best-effort
    val candidates =
      (2 to 0 by -1).map(line(_, Int.MaxValue)) ++
        Seq(60, 40, 25, 15).map(line(1, _))
    println(candidates.find(_.length <= 1920).getOrElse(line(0, 10)))
    spark.stop()
    if (errors.nonEmpty) {
      errors.foreach { case (k, v) => System.err.println(s"[bench] FAILED $k: $v") }
      sys.exit(1)
    }
  }
}
