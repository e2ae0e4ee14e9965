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
}
