package graft.etl

import org.apache.spark.sql.functions._

/** Semantics pins for the r16 event-analytics transforms: funnel step
  * ordering, transition-row normalization, forget idempotency, and the
  * z-order layout's pruning claim (the reason to z-order at all: a
  * predicate on the NON-leading dimension skips most z-ordered files,
  * where a linear sort's envelope covers every file). */
class TransformsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("T11 funnel: a step only counts at-or-after the previous step") {
    // u1 completes in order; u2 clicks BEFORE its only view (click must
    // not count); u3 purchases BEFORE its click (purchase must not count)
    val ev = Seq(
      (1L, ts(1, 1), 1L, "view", 0.0, "{}"),
      (2L, ts(1, 2), 1L, "click", 0.0, "{}"),
      (3L, ts(1, 3), 1L, "purchase", 0.0, "{}"),
      (4L, ts(2, 1), 2L, "click", 0.0, "{}"),
      (5L, ts(2, 2), 2L, "view", 0.0, "{}"),
      (6L, ts(3, 1), 3L, "view", 0.0, "{}"),
      (7L, ts(3, 2), 3L, "purchase", 0.0, "{}"),
      (8L, ts(3, 3), 3L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Transforms.funnelOf(ev).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ===
      Seq("view", "click", "purchase"))
    assert(rows.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    // u1: view 01:00 → purchase 03:00 = 7200 s (the only purchaser)
    assert(rows(2).getAs[Long]("mean_s_from_view") === 7200L)
    // conversion per-milles derive from the integer counts
    assert(rows(1).getAs[Long]("conv_pm_first") === 666L)
    assert(rows(2).getAs[Long]("conv_pm_prev") === 500L)
  }

  test("T12 transitions: per-prev per-milles are row-normalized") {
    val ev = Seq(
      (1L, ts(1, 1), 1L, "view", 0.0, "{}"),
      (2L, ts(1, 2), 1L, "click", 0.0, "{}"),
      (3L, ts(1, 3), 1L, "view", 0.0, "{}"),
      (4L, ts(1, 4), 1L, "click", 0.0, "{}"),
      (5L, ts(2, 1), 2L, "view", 0.0, "{}"),
      (6L, ts(2, 2), 2L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Transforms.transitionsOf(ev).collect()
      .map(r => (r.getAs[String]("prev"), r.getAs[String]("next"),
        r.getAs[Long]("n"), r.getAs[Long]("prob_pm"))).toSeq
    // view is followed by click twice and error once → 666 / 333
    assert(m.contains(("view", "click", 2L, 666L)))
    assert(m.contains(("view", "error", 1L, 333L)))
    // each prev row-group's per-milles sum to ≤ 1000 (integer floor)
    m.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sum <= 1000L)
    }
  }

  test("T13 forget: purging the purged corpus is a no-op (idempotent)") {
    val ev = (0L until 200L).map { i =>
      (i, ts((i % 20).toInt + 1, (i % 9).toInt), i % 50,
        Seq("view", "click", "purchase")((i % 3).toInt), 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val first = Transforms.forgetOf(ev).collect()
    val evRow = first.find(_.getAs[String]("store") == "events").get
    assert(evRow.getAs[Long]("n_purged") > 0L, "fixture must purge something")
    // re-run over the kept set: nothing left to purge, checksums stable
    val kept = ev.filter(col("user_id") % 37 =!= 0)
    val second = Transforms.forgetOf(kept).collect()
    val evRow2 = second.find(_.getAs[String]("store") == "events").get
    assert(evRow2.getAs[Long]("n_purged") === 0L)
    assert(evRow2.getAs[Long]("n_kept") === evRow.getAs[Long]("n_kept"))
    assert(evRow2.getAs[Long]("kept_id_sum") === evRow.getAs[Long]("kept_id_sum"))
  }

  test("T14 z-order prunes the non-leading dimension; linear sort cannot") {
    // dense grid: every (day 0-29, type 0-4) cell populated
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = (0L until 600L).map { i =>
      (i, ts((i % 30).toInt + 1, 0), i, types((i % 5).toInt), 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val z = Transforms.zorderOf(ev).collect()
    val nFiles = z.length.toLong
    assert(nFiles >= 4L, s"degenerate layout: $nFiles files")
    // predicate on the NON-leading dim (event_type = 'view' → tix 4):
    // count files whose [min_tix, max_tix] envelope contains 4
    val zTixHits = z.count(r =>
      r.getAs[Long]("min_tix") <= 4L && 4L <= r.getAs[Long]("max_tix")).toLong
    // the linear layout (sorted by day, same file count) spreads every
    // type across every file: its envelope always contains tix 4
    assert(zTixHits < nFiles,
      s"z-order failed to prune the type dimension: $zTixHits/$nFiles")
    // and the leading dim still prunes: a single-day predicate hits a
    // strict subset of files
    val zDayHits = z.count(r =>
      r.getAs[Long]("min_day") <= 10L && 10L <= r.getAs[Long]("max_day")).toLong
    assert(zDayHits < nFiles,
      s"z-order failed to prune the day dimension: $zDayHits/$nFiles")
  }
}
