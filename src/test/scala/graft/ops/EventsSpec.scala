package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("sessionize splits on gaps > 30 min and numbers sessions per user") {
    val ev = Seq(
      (1L, ts(0), 10L),   // u10 s1
      (2L, ts(10), 10L),  // u10 s1 (10 min gap)
      (3L, ts(50), 10L),  // u10 s2 (40 min gap)
      (4L, ts(51), 10L),  // u10 s2
      (5L, ts(0), 20L)    // u20 s1
    ).toDF("event_id", "ts", "user_id")
    val counts = Events.sessionCounts(ev, gapSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(counts === Map(10L -> 2L, 20L -> 1L))
  }

  test("a gap of exactly the threshold does NOT start a new session") {
    val ev = Seq((1L, ts(0), 1L), (2L, ts(30), 1L)).toDF("event_id", "ts", "user_id")
    val n = Events.sessionCounts(ev, gapSeconds = 1800L).head().getAs[Long]("n_sessions")
    assert(n === 1L)
  }

  test("tumblingHourly buckets on wall-clock hours") {
    val ev = Seq(
      (1L, ts(5), 1.0), (2L, ts(59), 2.0), (3L, ts(61), 4.0)
    ).toDF("event_id", "ts", "value")
    val rows = Events.tumblingHourly(ev)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    assert(rows === Map("1970-01-01 00:00:00" -> 2L, "1970-01-01 01:00:00" -> 1L))
  }

  test("asofJoin attaches the latest right row at-or-before; null when none; keys isolated") {
    val clicks = Seq(
      (1L, ts(5), 10L),   // before any view -> null
      (2L, ts(20), 10L),  // after views at 10, 15 -> 15
      (3L, ts(15), 10L),  // EXACTLY at a view's ts -> inclusive match (>=)
      (4L, ts(30), 20L)   // other user: own timeline only
    ).toDF("event_id", "ts", "user_id")
    val views = Seq(
      (100L, ts(10), 10L), (101L, ts(15), 10L), (102L, ts(25), 20L)
    ).toDF("view_id", "ts", "user_id")
      .select($"user_id", $"ts", $"view_id")
    val got = Events.asofJoin(
        clicks.select($"user_id", $"ts", $"event_id"), views,
        "user_id", "ts", Seq("view_id"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("view_id"))) None else Some(r.getAs[Long]("view_id"))))
      .toMap
    assert(got === Map(
      1L -> None, 2L -> Some(101L), 3L -> Some(101L), 4L -> Some(102L)))
  }

  test("asofJoin matches the ROW: a matched row's NULL payload stays NULL, multi-column payloads never mix rows") {
    // DuckDB/kdb ASOF semantics — match the latest row, return ITS values.
    // Per-column last(ignoreNulls) folding would (a) replace row B's null
    // quality with row A's older value, (b) stitch price from one row and
    // quality from another (ADVICE r4).
    val trades = Seq((1L, ts(30), 7L)).toDF("trade_id", "ts", "sym")
      .select($"sym", $"ts", $"trade_id")
    val quotes = Seq(
      (Some(100.0), Some("firm"), ts(10), 7L),  // older row: all fields set
      (Some(101.0), Option.empty[String], ts(20), 7L) // latest row: quality NULL
    ).toDF("price", "quality", "ts", "sym")
      .select($"sym", $"ts", $"price", $"quality")
    val r = Events.asofJoin(trades, quotes, "sym", "ts", Seq("price", "quality")).head()
    assert(r.getAs[Double]("price") === 101.0, "must take the LATEST row's price")
    assert(r.isNullAt(r.fieldIndex("quality")),
      "latest row's NULL quality must survive — not be backfilled from an older row")
  }

  test("asofJoin: NULL right key/ts matches nothing; payload collision rejected") {
    // SQL semantics — the DuckDB ASOF oracle's =/>= never match NULLs; a
    // null-ts right row must not attach its payload to everything
    val clicks = Seq((1L, ts(20), 10L)).toDF("event_id", "ts", "user_id")
      .select($"user_id", $"ts", $"event_id")
    val views = Seq(
      (Some(900L), Option.empty[java.sql.Timestamp], Some(10L)),
      (Some(901L), Some(ts(5)), Option.empty[Long])
    ).toDF("view_id", "ts", "user_id")
      .select($"user_id", $"ts", $"view_id")
    val r = Events.asofJoin(clicks, views, "user_id", "ts", Seq("view_id")).head()
    assert(r.isNullAt(r.fieldIndex("view_id")),
      "null-keyed/null-ts right rows must not match")
    val clash = intercept[IllegalArgumentException] {
      Events.asofJoin(clicks.withColumnRenamed("event_id", "view_id"), views,
        "user_id", "ts", Seq("view_id"))
    }
    assert(clash.getMessage.contains("collides"))
  }

  test("funnel: ordered stages, strict after-previous matching, contiguous depth") {
    val ev = Seq(
      // u1 completes in order: a(0) b(5) c(9)
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(9), "c"),
      // u2 has c BEFORE b: c at t=2 precedes b(4), and no later c exists
      // — depth stops at 2 even though all three types occur
      (2L, ts(0), "a"), (2L, ts(2), "c"), (2L, ts(4), "b"),
      // u3 never does stage a: depth 0 despite b and c events
      (3L, ts(1), "b"), (3L, ts(2), "c"),
      // u4: stage ts must be STRICTLY after — b at the same minute as a
      // does not count, the later b does
      (4L, ts(0), "a"), (4L, ts(0), "b"), (4L, ts(7), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 2))
  }

  test("cohortRetention: hour-cohorts with k=0 as cohort size, offsets bounded") {
    val ev = Seq(
      // cohort hour 0: u1 active hours 0,1,3; u2 active hour 0 only
      (1L, ts(5)), (1L, ts(70)), (1L, ts(190)),
      (2L, ts(30)),
      // cohort hour 2: u3 active hours 2,3
      (3L, ts(125)), (3L, ts(185))
    ).toDF("user_id", "ts")
    val got = Events.cohortRetention(ev, "user_id", "ts", maxOffset = 2)
      .collect()
      .map(r => (r.getAs[Timestamp]("cohort_hour").getTime / 3600000L,
        r.getAs[Int]("k")) -> r.getAs[Long]("n_active")).toMap
    assert(got === Map(
      (0L, 0) -> 2L,  // u1 + u2 in their own first hour
      (0L, 1) -> 1L,  // u1 at hour 1
      (2L, 0) -> 1L,  // u3's cohort (hour 2) size
      (2L, 1) -> 1L), // u3 at hour 3
      s"unexpected retention table: $got")
    // u1's hour-3 activity (k=3) is beyond maxOffset=2 and must be absent
    assert(!got.contains((0L, 3)))
  }

  test("rollingActiveUsers: exact distinct per window-end, fan-out bounded by windowDays") {
    def day(d: Int) = ts(d * 1440L) // midnight of day d (1970-01-0(1+d))
    val ev = Seq(
      (1L, day(0)), (1L, day(0)), // duplicate same-day activity collapses
      (2L, day(0)),
      (1L, day(2)),
      (3L, day(3))
    ).toDF("user_id", "ts")
    val got = Events.rollingActiveUsers(ev, "user_id", "ts", windowDays = 3)
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.getDayOfMonth - 1 ->
        r.getAs[Long]("active_users")).toMap
    // windows of 3 days ending on day D cover (D-2..D]
    assert(got === Map(
      0 -> 2L, // u1,u2 on day 0
      1 -> 2L, // day 0 activity still in window
      2 -> 2L, // day0 (u1,u2) + day2 (u1) → distinct {1,2}
      3 -> 2L, // u1 (day2) + u3 (day3)
      4 -> 2L, // same pair, windows (2..4]
      5 -> 1L  // only u3 (day3) in (3..5]
    ), s"got $got")
  }

  test("rangeJoin matches interval containment inclusively, across bucket boundaries") {
    // buckets of 10 min; interval B straddles a bucket boundary — the
    // bucketized join must still pair it exactly once with each point
    val points = Seq((1L, ts(0)), (2L, ts(9)), (3L, ts(12)), (4L, ts(31)))
      .toDF("point_id", "ts")
    val intervals = Seq(
      (100L, ts(0), ts(9)),    // A: within one bucket; contains 1, 2
      (101L, ts(8), ts(12)),   // B: straddles buckets 0/1; contains 2, 3
      (102L, ts(40), ts(50))   // C: empty
    ).toDF("interval_id", "w_start", "w_end")
    val got = Events.rangeJoin(points, intervals, "ts", "w_start", "w_end",
        bucketSeconds = 600L)
      .select($"point_id", $"interval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L)))
  }
}
