package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin.pointInInterval: equality with the nested-loop encoding,
  * half-open boundary + bin-boundary edges, empty-interval safety, and
  * the hash-join (never nested-loop) plan shape.
  */
class RangeJoinSpec extends SpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val HalfHourUs = 30L * 60 * 1000000

  test("matches the inequality-join encoding on the events table") {
    val ev = Tables.events(spark, SfDir).select($"event_id", $"ts")
    // overlapping, non-bin-aligned intervals derived from the data
    val iv = ev.groupBy(date_trunc("hour", $"ts").as("h")).agg(count(lit(1)).as("cnt"))
      .select(($"h" - expr("INTERVAL 15 MINUTE")).as("s"),
        ($"h" + expr("INTERVAL 75 MINUTE")).as("e"), $"cnt")

    val fast = RangeJoin.pointInInterval(ev, "ts", iv, "s", "e", HalfHourUs)
      .select($"event_id", $"s").collect().map(r => (r.getLong(0), r.get(1))).toSeq.sorted(
        Ordering.by((t: (Long, Any)) => (t._1, t._2.toString)))
    val slow = ev.join(iv, $"ts" >= $"s" && $"ts" < $"e")
      .select($"event_id", $"s").collect().map(r => (r.getLong(0), r.get(1))).toSeq.sorted(
        Ordering.by((t: (Long, Any)) => (t._1, t._2.toString)))
    assert(fast.size == slow.size && fast == slow,
      s"fast ${fast.size} rows vs slow ${slow.size}")
  }

  test("half-open boundaries: start matches, end does not; bin-edge points land once") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: in
      (2L, ts("2024-01-01 11:00:00")), // == end: out
      (3L, ts("2024-01-01 10:30:00")), // exactly on an interior bin edge
      (4L, ts("2024-01-01 10:59:59.999999"))
    ).toDF("id", "t")
    val iv = Seq((ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w"))
      .toDF("s", "e", "name")
    val got = RangeJoin.pointInInterval(points, "t", iv, "s", "e", HalfHourUs)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L, 4L), s"got $got")
  }

  test("interval spanning many bins matches each contained point exactly once") {
    val points = (0 until 10).map(i => (i.toLong, ts(f"2024-01-01 1$i%d:30:00"))).toDF("id", "t")
    val iv = Seq((ts("2024-01-01 12:10:00"), ts("2024-01-01 17:10:00"), "wide"))
      .toDF("s", "e", "name")
    val got = RangeJoin.pointInInterval(points, "t", iv, "s", "e", HalfHourUs)
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L),
      s"got $got")
  }

  test("empty and inverted intervals match nothing") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "t")
    val iv = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), "empty"),
      (ts("2024-01-01 12:00:00"), ts("2024-01-01 09:00:00"), "inverted"))
      .toDF("s", "e", "name")
    assert(RangeJoin.pointInInterval(points, "t", iv, "s", "e", HalfHourUs).count() == 0)
  }

  test("plans a hash join on the bin key, never a nested loop") {
    val ev = Tables.events(spark, SfDir).select($"event_id", $"ts")
    val iv = ev.groupBy(date_trunc("hour", $"ts").as("h")).agg(count(lit(1)).as("cnt"))
      .select(($"h" - expr("INTERVAL 15 MINUTE")).as("s"),
        ($"h" + expr("INTERVAL 75 MINUTE")).as("e"))
    val plan = RangeJoin.pointInInterval(ev, "ts", iv, "s", "e", HalfHourUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n${plan.take(600)}")
    assert(plan.contains("HashJoin"), s"expected a hash join on the bin:\n${plan.take(600)}")
  }

  test("intervalOverlap matches the inequality join, each pair exactly once") {
    // adversarial mix: long spans sharing MANY bins (the multi-emit trap
    // the canonical-bin rule exists for), touching endpoints (half-open:
    // no overlap), 1-µs intervals, inverted/empty intervals
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")), // 12 bins
      (2L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:01")),
      (3L, ts("2024-01-01 07:00:00"), ts("2024-01-01 07:00:00")), // empty
      (4L, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00")), // inverted
      (5L, ts("2024-01-01 08:00:00"), ts("2024-01-01 08:30:00"))
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 05:00:00")), // 8 shared bins with a1
      (11L, ts("2024-01-01 05:59:59"), ts("2024-01-01 06:30:00")),
      (12L, ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")), // touches a1's end: no overlap
      (13L, ts("2024-01-01 02:00:00.000001"), ts("2024-01-01 03:00:00")) // misses a2 by 1 µs... or not?
    ).toDF("b_id", "b_s", "b_e")

    val fast = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", HalfHourUs)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val slow = a.filter($"a_s" < $"a_e").join(b.filter($"b_s" < $"b_e"),
        $"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast.sorted == slow.sorted, s"fast=${fast.sorted} slow=${slow.sorted}")
    assert(fast.distinct.length == fast.length,
      s"canonical-bin rule must emit each pair once: ${fast.groupBy(identity).filter(_._2.length > 1).keys}")
    // the long-span pair that shares 8 bins is present (and once)
    assert(fast.count(_ == (1L, 10L)) == 1)
  }

  test("q133 composition matches its oracle shape on real sessions (spot check)") {
    val got = SparkEntry.queries("q133_session_incidents")(spark, SfDir)
    val rows = got.collect()
    assert(rows.nonEmpty, "expected some session×incident overlaps at sf0.001")
    // every emitted pair genuinely overlaps (half-open with the 1-µs tail)
    rows.foreach { r =>
      val sS = r.getAs[Timestamp]("s_start").getTime
      val sE = r.getAs[Timestamp]("s_end").getTime
      val wS = r.getAs[Timestamp]("w_start").getTime
      val wE = r.getAs[Timestamp]("w_end").getTime
      assert(sS < wE && wS <= sE, s"non-overlapping pair emitted: $r")
    }
  }
}
