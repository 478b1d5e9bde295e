package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytic, Events}

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.map { case (id, u, t, ty) => (id, u, ts(t), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")

  test("bucketed range join equals the naive range-join semantics") {
    val events = ev(
      (1L, 1L, 1000L, "error"),
      (2L, 1L, 1100L, "view"),  // within 300s of error 1
      (3L, 1L, 1400L, "view"),  // spans the bucket boundary, still ≤ +300s? 1400-1000=400 > 300 → no
      (4L, 1L, 1299L, "view"),  // yes (299s)
      (5L, 2L, 1100L, "view"),  // other user → no
      (6L, 2L, 5000L, "error")) // no views after
    val got = Events.windowedMatchCount(
      events.filter(col("event_type") === "error"),
      events.filter(col("event_type") === "view"),
      "user_id", 300L)
      .select("event_id", "user_id", "n_matches")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L), (6L, 2L, 0L)))
  }

  test("windowedMatchCount keeps per-key opener identity (no cross-key id merging)") {
    // SAME opener event_id under two different keys: counts must stay
    // separate per (key, id), not merge into one row
    val events = ev(
      (7L, 1L, 1000L, "error"), (8L, 1L, 1100L, "view"),
      (7L, 2L, 1000L, "error"))
    val got = Events.windowedMatchCount(
      events.filter(col("event_type") === "error"),
      events.filter(col("event_type") === "view"),
      "user_id", 300L)
      .select("event_id", "user_id", "n_matches")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 1L, 1L), (7L, 2L, 0L)))
  }

  test("funnel: per-key stage reached, strictly-after within the window") {
    val events = ev(
      // user 1: full funnel — view@1000, click@1500, purchase@1800
      (1L, 1L, 1000L, "view"), (2L, 1L, 1500L, "click"), (3L, 1L, 1800L, "purchase"),
      // user 2: click outside the window after its first view
      (4L, 2L, 1000L, "view"), (5L, 2L, 9000L, "click"),
      // user 3: click BEFORE the view only — strictly-after must reject it
      (6L, 3L, 500L, "click"), (7L, 3L, 1000L, "view"),
      // user 4: never views — not in the funnel at all
      (8L, 4L, 1000L, "click"),
      // user 5: second view would match, but the funnel anchors on the FIRST
      (9L, 5L, 1000L, "view"), (10L, 5L, 8000L, "view"), (11L, 5L, 8100L, "click"))
    val got = Events.funnel(events, "user_id",
        Seq("view", "click", "purchase"), withinSec = 1000L)
      .select("user_id", "view_us", "click_us", "purchase_us", "stage")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSet
    assert(got === Set(
      (1L, 1000000000L, Some(1500000000L), Some(1800000000L), 3),
      (2L, 1000000000L, None, None, 1),
      (3L, 1000000000L, None, None, 1),
      (5L, 1000000000L, None, None, 1)))
  }

  test("retention: signup-anchored distinct daily actives per cohort/offset") {
    val day = 86400L
    val events = ev(
      // user 1 signs up day 0, active day 0 (twice) and day 2
      (1L, 1L, 0L, "signup"), (2L, 1L, 100L, "view"), (3L, 1L, 2 * day, "click"),
      // user 2 signs up day 0, active day 0 only
      (4L, 2L, 0L, "signup"),
      // user 3 never signs up — excluded entirely
      (5L, 3L, 0L, "view"),
      // user 4: pre-signup activity on day 0 ignored; signs up day 1,
      // active day 1 and day 2 (offsets 0 and 1)
      (8L, 4L, 100L, "view"),
      (6L, 4L, day, "signup"), (7L, 4L, 2 * day, "purchase"))
    val got = Events.retention(events, "user_id", "signup")
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("1970-01-01", 0, 2L), ("1970-01-01", 2, 1L),
      ("1970-01-02", 0, 1L), ("1970-01-02", 1, 1L)))
  }

  test("asOfJoin matches latest at-or-before per key, ties included") {
    val clicks = ev((1L, 1L, 100L, "click"), (2L, 1L, 200L, "click"), (3L, 2L, 50L, "click"))
    val purchases = ev((10L, 1L, 200L, "purchase"), (11L, 1L, 150L, "purchase"), (12L, 3L, 99L, "purchase"))
    val got = Events.asOfJoin(clicks, purchases, "user_id")
      .select("event_id", "asof_ts_us").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      10L -> Some(200000000L), // equal timestamp click visible
      11L -> Some(100000000L),
      12L -> None))            // no click for user 3
  }

  test("sessionize counts gap-separated sessions") {
    val events = ev(
      (1L, 1L, 0L, "a"), (2L, 1L, 100L, "a"),        // session 1
      (3L, 1L, 3000L, "a"),                          // gap 2900 > 1800 → session 2
      (4L, 2L, 0L, "a"))
    val got = Events.sessionize(events, "user_id", 1800L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 3L)), 2L -> ((1L, 1L))))
  }

  test("scd2 builds validity intervals; simultaneous changes break ties by id") {
    val changes = ev(
      (10L, 1L, 100L, "bronze"), (11L, 1L, 200L, "gold"),
      // same timestamp: id 20 gets the deterministic zero-length interval
      (20L, 2L, 100L, "a"), (21L, 2L, 100L, "b"))
    val got = Events.scd2(changes, "user_id", col("event_type"), "tier")
      .as[(Long, String, Long, Long)].collect().toSet
    val eot = Events.EndOfTimeUs
    assert(got === Set(
      (1L, "bronze", 100000000L, 200000000L),
      (1L, "gold", 200000000L, eot),
      (2L, "a", 100000000L, 100000000L),
      (2L, "b", 100000000L, eot)))
  }

  test("pointInTimeJoin picks the dimension row valid AT each fact ts — never a later one") {
    val purchases = ev((10L, 1L, 100L, "purchase"), (11L, 1L, 200L, "purchase"))
    val clicks = ev(
      (1L, 1L, 50L, "click"),   // before any dim row → dropped
      (2L, 1L, 150L, "click"),  // inside [100, 200) → ver 10
      (3L, 1L, 200L, "click"),  // boundary: valid_from inclusive → ver 11
      (4L, 2L, 100L, "click"))  // no dim for user 2 → dropped
    val dim = Events.scd2(purchases, "user_id", col("event_id"), "ver")
    val got = Events.pointInTimeJoin(clicks, dim, "user_id")
      .select("event_id", "ver").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 10L, 3L -> 11L))
    // each fact matches AT MOST one dim row (intervals partition the timeline)
    assert(Events.pointInTimeJoin(clicks, dim, "user_id").count() === 2L)
  }

  test("longestRun finds the max run with smallest-type tie-break") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = ev(
      (1L, 1L, 1L, "b"), (2L, 1L, 2L, "b"),   // run b×2
      (3L, 1L, 3L, "a"), (4L, 1L, 4L, "a"),   // run a×2 → tie, a < b wins
      (5L, 2L, 1L, "x"))
    val got = Analytic.longestRun(events)
      .collect().map(r => r.user_id -> ((r.run_len, r.run_type))).toMap
    assert(got === Map(1L -> ((2, "a")), 2L -> ((1, "x"))))
  }
}
