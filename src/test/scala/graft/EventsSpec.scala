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
