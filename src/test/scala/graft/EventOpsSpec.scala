package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** [[graft.operators.EventOps]] edge semantics the DuckDB differential
  * can't pin (the generated events table has no same-ts ties and no
  * userless probes): as-of tie-breaks, missing references, session gap
  * boundaries, and the no-pair-join plan shape.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinOf: inclusive ts, same-ts ref ties resolve to max tie id") {
    val refs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 5.0),
      (1L, ts("2024-01-01 10:00:00"), 101L, 7.0), // same ts, larger id wins
      (1L, ts("2024-01-01 11:00:00"), 102L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 200L), // ref AT probe ts counts
      (1L, ts("2024-01-01 10:30:00"), 201L),
      (1L, ts("2024-01-01 12:00:00"), 202L),
      (1L, ts("2024-01-01 09:00:00"), 203L), // before all refs -> NULL
      (2L, ts("2024-01-01 10:00:00"), 204L)) // user with no refs -> NULL
      .toDF("user_id", "ts", "event_id")
    val out = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
      Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("ref_event_id")),
          Option(r.getAs[java.lang.Double]("ref_value")))).toMap
    assert(out(200L) == ((Some(101L), Some(7.0)))) // tie -> id 101, not 100
    assert(out(201L) == ((Some(101L), Some(7.0))))
    assert(out(202L) == ((Some(102L), Some(9.0))))
    assert(out(203L) == ((None, None)))
    assert(out(204L) == ((None, None)))
  }

  test("asofJoinOf tolerance: stale matches null out, fresh ones survive") {
    val refs = Seq((1L, ts("2024-01-01 10:00:00"), 100L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 10:30:00"), 200L), // 30 min later: fresh
      (1L, ts("2024-01-01 12:00:01"), 201L)) // > 2h later: stale
      .toDF("user_id", "ts", "event_id")
    val out = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
        Seq("value"), tolSec = Some(7200L))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ref_event_id"))).toMap
    assert(out(200L).contains(100L))
    assert(out(201L).isEmpty) // beyond tolerance: no match, not a stale one
    // without the bound both match — tolerance only ever REMOVES matches
    val unbounded = EventOps.asofJoinOf(probes, refs, "user_id", "ts",
        "event_id", Seq("value"))
      .collect().map(_.getAs[java.lang.Long]("ref_event_id"))
    assert(unbounded.forall(_ == 100L))
  }

  test("asofJoinOf forward: inclusive >=, same-ts ref ties resolve to MIN tie id") {
    val refs = Seq(
      (1L, ts("2024-01-01 11:00:00"), 100L, 5.0),
      (1L, ts("2024-01-01 11:00:00"), 101L, 7.0), // same ts: smaller id wins
      (1L, ts("2024-01-01 10:00:00"), 102L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 11:00:00"), 200L), // ref AT probe ts counts
      (1L, ts("2024-01-01 10:30:00"), 201L), // next ref is 11:00
      (1L, ts("2024-01-01 12:00:00"), 202L), // after all refs -> NULL
      (2L, ts("2024-01-01 10:00:00"), 203L)) // no refs -> NULL
      .toDF("user_id", "ts", "event_id")
    val out = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
        Seq("value"), direction = "forward")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ref_event_id")).map(_.toLong)).toMap
    assert(out(200L).contains(100L)) // min id among the two same-ts refs
    assert(out(201L).contains(100L))
    assert(out(202L).isEmpty)
    assert(out(203L).isEmpty)
  }

  test("asofJoinOf nearest: smaller gap wins, equal gap resolves backward, tolerance per side") {
    val refs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 12:00:00"), 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 10:30:00"), 200L), // 30m back vs 90m fwd -> back
      (1L, ts("2024-01-01 11:45:00"), 201L), // 105m back vs 15m fwd -> fwd
      (1L, ts("2024-01-01 11:00:00"), 202L)) // equal 60m -> backward
      .toDF("user_id", "ts", "event_id")
    val near = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
        Seq("value"), direction = "nearest")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("ref_event_id")).toMap
    assert(near == Map(200L -> 100L, 201L -> 101L, 202L -> 100L))
    // tolerance bounds each side BEFORE the choice: at 202 (60m each
    // way) a 30-minute tolerance kills both; at 201 it keeps forward
    // even though backward exists out-of-tolerance
    val tol = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
        Seq("value"), tolSec = Some(1800L), direction = "nearest")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ref_event_id")).map(_.toLong)).toMap
    assert(tol(200L).contains(100L))
    assert(tol(201L).contains(101L))
    assert(tol(202L).isEmpty)
  }

  test("eventFunnel: stage counts are monotone non-increasing, order enforced") {
    val rows = EventOps.eventFunnel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.toSeq.toString)
    // a crafted out-of-order user: purchase BEFORE click never converts
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "purchase"), // before the view
      (1L, ts("2024-01-01 11:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    // stage semantics checked through the same fold the operator uses:
    // view@10 -> click@11 qualifies; no purchase after 11 -> stage3 = 0
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t"))
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts" > $"t")
    val s3 = ev.filter($"event_type" === "purchase")
      .join(s2.select($"user_id", $"ts".as("t2")), "user_id")
      .filter($"ts" > $"t2")
    assert(s2.count() == 1 && s3.count() == 0)
  }

  test("retention: week-0 row equals cohort size; offsets are bounded by the span") {
    val rows = EventOps.retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0))
    byCohort.foreach { case (_, rs) =>
      val w = rs.map(r => r.getInt(1) -> r.getAs[Long]("n_users")).toMap
      assert(w.contains(0)) // every cohort is active in its own week
      // week-0 count >= any later week's count is NOT guaranteed
      // (returning users), but offsets must be non-negative
      assert(w.keys.forall(_ >= 0))
    }
  }

  test("asofJoinOf: ref payload fields stay consistent (one struct, not per-column last)") {
    // the later reference carries a NULL payload value; a per-column
    // last_value(IGNORE NULLS) would stitch id from ref 11 with value
    // from ref 10 — the struct form must keep (11, NULL) together
    val refs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), 11L, None))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, ts("2024-01-01 12:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val r = EventOps.asofJoinOf(probes, refs, "user_id", "ts", "event_id",
      Seq("value")).collect().head
    assert(r.getAs[java.lang.Long]("ref_event_id") == 11L)
    assert(r.getAs[java.lang.Double]("ref_value") == null)
  }

  test("asofJoin plan: no cartesian/nested-loop pair join, one window") {
    val plan = EventOps.asofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("sessionizeOf: gap strictly-greater boundary; ties never split a session") {
    val ev = Seq(
      // user 1: events at 0s, 1800s (exactly the gap - same session),
      // then 3601s (gap exceeded - new session)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, "view", 2.0),
      (1L, ts("2024-01-01 11:30:01"), 3L, "click", 4.0),
      // user 2: two events at the SAME ts - one session regardless of order
      (2L, ts("2024-01-01 10:00:00"), 4L, "click", 1.0),
      (2L, ts("2024-01-01 10:00:00"), 5L, "view", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = EventOps.sessionizeOf(ev, "user_id", "ts", "event_id",
      1800L, "value")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
          r.getAs[Double]("total_value"), r.getAs[Long]("n_event_types")))
      .toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(out((1L, 1L)) == ((2L, 1800000000L, 3.0, 2L)))
    assert(out((1L, 2L)) == ((1L, 0L, 4.0, 1L)))
    assert(out((2L, 1L)) == ((2L, 0L, 2.0, 2L)))
  }

  test("rangeJoinOf: inclusive bounds, one match across buckets, equi-join plan") {
    // bucketSec = 60 so the 10:00–10:05 interval spans 6 buckets; the
    // probe at 10:03 must match it exactly ONCE (point lives in one
    // bucket); bounds are inclusive on both ends
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:01:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 102L))
      .toDF("user_id", "s", "e", "iv_id")
    val points = Seq(
      (1L, ts("2024-01-01 10:03:00"), 200L), // interior, multi-bucket iv
      (1L, ts("2024-01-01 10:00:00"), 201L), // exactly at start
      (1L, ts("2024-01-01 10:05:00"), 202L), // exactly at end
      (1L, ts("2024-01-01 10:06:00"), 203L), // outside -> dropped
      (3L, ts("2024-01-01 10:03:00"), 204L)) // no such key -> dropped
      .toDF("user_id", "ts", "event_id")
    val out = EventOps.rangeJoinOf(points, intervals, Seq("user_id"),
      "ts", "s", "e", bucketSec = 60L)
    val rows = out.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("iv_id"))
    assert(rows.length == 3) // exactly-once: no duplicate for 200
    assert(rows.toMap == Map(200L -> 100L, 201L -> 100L, 202L -> 100L))
    // the plan must be an equi hash join on (keys, bucket) — never the
    // inequality-only BroadcastNestedLoopJoin/CartesianProduct shape
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("intervalJoinOf: overlapping pairs exactly once, touching and disjoint handled") {
    // bucketSec = 60; the first pair overlaps across 4 shared buckets
    // and must emit ONCE; the second pair touches at a single instant
    // (max start == min end — overlaps, 0-length); the third is disjoint
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 10L),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 11L),
      (3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 12L))
      .toDF("user_id", "ls", "le", "l_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:20:00"), 20L),
      (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:06:00"), 21L),
      (3L, ts("2024-01-01 10:02:00"), ts("2024-01-01 10:03:00"), 22L))
      .toDF("user_id", "rs", "re", "r_id")
    val out = EventOps.intervalJoinOf(left, right, Seq("user_id"),
      "ls", "le", "rs", "re", bucketSec = 60L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
    assert(out.sorted.toSeq == Seq((10L, 20L), (11L, 21L)))
  }

  test("intervalUnionOf: overlap/touch/nest merge, disjoint split, lengths exact") {
    // user 1: [10:00,10:30] ∪ [10:15,10:45] (overlap) ∪ [10:45,11:00]
    //         (touching -> same segment) = one 60-min segment;
    //         [12:00,12:10] disjoint -> second segment. Total 70 min.
    // user 2: [10:00,11:00] ⊃ [10:10,10:20] (nested — running MAX end,
    //         not lag(end), must keep the outer end) ∪ [10:50,11:30]
    //         = one 90-min segment.
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00")),
      (1L, ts("2024-01-01 10:45:00"), ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00")),
      (2L, ts("2024-01-01 10:50:00"), ts("2024-01-01 11:30:00")))
      .toDF("user_id", "s", "e")
    val out = EventOps.intervalUnionOf(iv, "user_id", "s", "e")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_segments"),
          r.getAs[Long]("covered_us"))).toMap
    assert(out(1L) == ((4L, 2L, 70L * 60 * 1000000L)))
    assert(out(2L) == ((3L, 1L, 90L * 60 * 1000000L)))
  }

  test("rangeJoinOf maxBuckets: adversarially long interval is exact via the fallback arm") {
    // one WEEK-long interval against 60 s buckets would replicate into
    // ~10k bucket rows uncapped; with maxBuckets = 10 it must route to
    // the keys-only fallback arm — same matches, bounded replication,
    // still no nested-loop/cartesian anywhere in the plan
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"), 100L), // long
      (1L, ts("2024-01-02 10:00:00"), ts("2024-01-02 10:05:00"), 101L), // short, nested inside
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 102L))
      .toDF("user_id", "s", "e", "iv_id")
    val points = Seq(
      (1L, ts("2024-01-02 10:03:00"), 200L), // inside BOTH user-1 intervals
      (1L, ts("2024-01-05 00:00:00"), 201L), // inside the long one only
      (1L, ts("2024-01-09 00:00:00"), 202L), // outside both -> dropped
      (2L, ts("2024-01-01 10:03:00"), 203L))
      .toDF("user_id", "ts", "event_id")
    val capped = EventOps.rangeJoinOf(points, intervals, Seq("user_id"),
      "ts", "s", "e", bucketSec = 60L, maxBuckets = 10)
    val expected = Set((200L, 100L), (200L, 101L), (201L, 100L), (203L, 102L))
    val got = capped.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("iv_id"))).toSet
    assert(got == expected)
    // exact-split contract: capped == uncapped, pair for pair
    val uncapped = EventOps.rangeJoinOf(points, intervals, Seq("user_id"),
      "ts", "s", "e", bucketSec = 60L, maxBuckets = Int.MaxValue)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("iv_id")))
    assert(uncapped.length == 4 && uncapped.toSet == expected)
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("intervalJoinOf maxBuckets: long×long, long×short, short×long each exactly once") {
    // every over-cap combination must surface exactly once through its
    // designated arm: longL×longR and longL×shortR via the longL arm,
    // shortL×longR via the third arm, shortL×shortR bucketized
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"), 10L), // long
      (1L, ts("2024-01-03 10:00:00"), ts("2024-01-03 10:10:00"), 11L)) // short
      .toDF("user_id", "ls", "le", "l_id")
    val right = Seq(
      (1L, ts("2024-01-04 00:00:00"), ts("2024-01-11 00:00:00"), 20L), // long
      (1L, ts("2024-01-03 10:05:00"), ts("2024-01-03 10:06:00"), 21L), // short
      (1L, ts("2024-02-01 00:00:00"), ts("2024-02-08 00:00:00"), 22L)) // long, disjoint
      .toDF("user_id", "rs", "re", "r_id")
    val out = EventOps.intervalJoinOf(left, right, Seq("user_id"),
      "ls", "le", "rs", "re", bucketSec = 60L, maxBuckets = 10)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
    // 10 overlaps 20 (long×long) and 21 (long×short); 11 overlaps 21
    // (short×short, bucketized); nothing overlaps 22
    assert(out.length == 3 && out.toSet ==
      Set((10L, 20L), (10L, 21L), (11L, 21L)))
    val uncapped = EventOps.intervalJoinOf(left, right, Seq("user_id"),
      "ls", "le", "rs", "re", bucketSec = 60L, maxBuckets = Int.MaxValue)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
    assert(uncapped.sorted.toSeq == out.sorted.toSeq)
  }

  test("bucketReplicationAuditOf: counters split exactly at the cap") {
    // nb at 60 s buckets: 1-min iv crossing no boundary = 1 or 2; the
    // 10-min iv = 11; the week iv = 10081 — cap at 10 puts only the
    // week over
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:10"), ts("2024-01-01 10:00:50")), // 1 bucket
      (1L, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:01:30")), // 2 buckets
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")), // 11 buckets
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"))) // 10081
      .toDF("user_id", "s", "e")
    val a = EventOps.bucketReplicationAuditOf(iv, "s", "e", 60L, 10)
      .collect().head
    assert(a.getAs[Long]("n_intervals") == 4L)
    assert(a.getAs[Long]("n_over_cap") == 2L)      // the 11 and the week
    assert(a.getAs[Long]("max_buckets") == 10081L)
    assert(a.getAs[Long]("replicated_rows") == 3L)  // 1 + 2
    assert(a.getAs[Long]("over_cap_buckets") == 11L + 10081L)
  }

  test("idleGapsOf: gaps complement the union exactly (span = covered + idle)") {
    // user 1: segments [10:00,11:00] and [12:00,12:10] -> one 60-min gap;
    // user 2: one segment -> zero gaps, zero idle
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 10:15:00"), ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00")))
      .toDF("user_id", "s", "e")
    val gaps = EventOps.idleGapsOf(iv, "user_id", "s", "e")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("idle_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("span_us"))).toMap
    assert(gaps(1L) == ((1L, 60L * 60 * 1000000L, 60L * 60 * 1000000L,
      130L * 60 * 1000000L)))
    assert(gaps(2L) == ((0L, 0L, 0L, 20L * 60 * 1000000L)))
    // the identity against the union, on the real fixture: per user,
    // span == covered + idle
    val union = EventOps.activeTime(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("covered_us")).toMap
    val idle = EventOps.idleGaps(spark, sfDir).collect()
    assert(idle.nonEmpty)
    idle.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("span_us") ==
        union(u) + r.getAs[Long]("idle_us"), s"user $u")
    }
  }

  test("retentionMatrix: cells reconcile with q_retention; week-0 is the full cohort") {
    val cells = EventOps.retention(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    val matrix = EventOps.retentionMatrix(spark, sfDir).collect()
    assert(matrix.length == cells.size)
    matrix.foreach { r =>
      val key = (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("week_offset"))
      assert(cells(key) == r.getAs[Long]("n_users"))
      val pct = r.getAs[Double]("retention_pct")
      if (key._2 == 0) {
        // a user's first active day is in week 0, so the week-0 cell IS
        // the cohort: count == size, rate exactly 100
        assert(r.getAs[Long]("n_users") == r.getAs[Long]("cohort_size"))
        assert(pct == 100.0)
      } else {
        assert(pct > 0.0 && pct <= 100.0)
        assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cohort_size"))
      }
    }
  }

  test("sessionizeOf == Spark's native session_window on the real table") {
    // semantic cross-check against the engine's own session operator:
    // session_window(ts, gap) merges an event iff ts < last + gap
    // (half-open), ours iff ts - last <= gap (closed) — they agree on
    // every input with no inter-arrival EXACTLY equal to the gap, so
    // first prove the fixture slice has none, then require identical
    // sessions: window.start == session_start, window.end ==
    // session_end + gap, same event counts
    val ev = Tables.events(spark, sfDir).filter($"user_id" < 50)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
    val gapUs = 1800L * 1000000L
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val exactGapPairs = ev
      .withColumn("prev", lag(unix_micros($"ts"), 1).over(ord))
      .filter(unix_micros($"ts") - $"prev" === gapUs).count()
    assert(exactGapPairs == 0L, "fixture grew an exact-gap tie; pick another slice")
    val ours = EventOps.sessionizeOf(ev, "user_id", "ts", "event_id",
        1800L, "value")
      .select($"user_id", unix_micros($"session_start").as("s"),
        unix_micros($"session_end").as("e"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val native = ev
      .groupBy($"user_id", session_window($"ts", "1800 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"w.start").as("s"),
        (unix_micros($"w.end") - gapUs).as("e"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ours.nonEmpty && ours == native)
  }

  test("sessionize: session count and totals reconcile with the raw table") {
    val raw = Tables.events(spark, sfDir)
    val sessions = EventOps.sessionize(spark, sfDir)
    val nEvents = sessions.agg(sum($"n_events")).as[Long].head()
    assert(nEvents == raw.count())
    // every session's span is within bounds and sessions are 1..k per user
    val bad = sessions.filter($"session_end" < $"session_start" ||
      $"duration_us" < 0L).count()
    assert(bad == 0L)
    val perUser = sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max($"session_idx").as("mx"))
      .filter($"n" =!= $"mx").count()
    assert(perUser == 0L)
  }
}
