package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** AsOf.asofJoin: semantic equality with the pair-expanding join+rank
  * encoding on real data, the edge cases that define as-of semantics
  * (equal timestamps, ties, no-predecessor), atomic struct carry, and
  * the single-exchange plan shape that is the operator's reason to exist.
  */
class AsOfSpec extends SpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches the join+rank encoding on the events table") {
    val ev = Tables.events(spark, SfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("v_ts"), $"event_id".as("v_id"))

    val fast = AsOf.asofJoin(p, v.withColumnRenamed("v_ts", "ts").withColumnRenamed("v_id", "event_id"),
      key = "user_id", time = "ts", carryCols = Seq("ts", "event_id"), buildTie = "event_id")
      .select($"event_id", $"asof_ts", $"asof_event_id")

    val w = Window.partitionBy($"event_id").orderBy($"v_ts".desc_nulls_last, $"v_id".desc)
    val slow = p.join(v, p("user_id") === v("user_id") && $"v_ts" <= p("ts"), "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"v_ts".as("asof_ts"), $"v_id".as("asof_event_id"))

    val l = fast.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val r = slow.collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(l == r, s"asof-only ${(l -- r).take(3)}, rank-only ${(r -- l).take(3)}")
  }

  test("equal-timestamp build rows match (<=), largest tie column wins, no-predecessor is null") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exact-tie with two build rows
      (1L, 11L, ts("2024-01-01 09:00:00")), // before any build row
      (2L, 12L, ts("2024-01-01 12:00:00"))  // key with no build rows at all
    ).toDF("user_id", "event_id", "ts")
    val build = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 101L, ts("2024-01-01 10:00:00"), "b"), // same ts: 101 > 100 wins
      (1L, 102L, ts("2024-01-01 11:00:00"), "c")  // after the probe: ignored
    ).toDF("user_id", "event_id", "ts", "tag")

    val rows = AsOf.asofJoin(probe, build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id")
      .select($"event_id", $"asof_event_id", $"asof_tag")
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    assert(rows.size == 3, s"every probe row survives: $rows")
    assert(rows(10L) == ((101L, "b")), s"equal-ts tie: ${rows(10L)}")
    assert(rows(11L) == ((null, null)), s"no predecessor: ${rows(11L)}")
    assert(rows(12L) == ((null, null)), s"key absent from build: ${rows(12L)}")
  }

  test("carried struct is atomic: null build fields never mix rows") {
    val probe = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("user_id", "event_id", "ts")
    val build = Seq(
      (1L, 100L, ts("2024-01-01 08:00:00"), Option("early")),
      (1L, 101L, ts("2024-01-01 09:00:00"), Option.empty[String]) // latest, null tag
    ).toDF("user_id", "event_id", "ts", "tag")
    val row = AsOf.asofJoin(probe, build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id")
      .select($"asof_event_id", $"asof_tag").head()
    // per-column carry-forward would resurrect "early" next to id 101
    assert(row.getLong(0) == 101L && row.isNullAt(1),
      s"expected (101, null) from the latest row, got $row")
  }

  test("null-time build rows never match, in all three realizations") {
    // Under the window's default nulls-first order an unfiltered
    // carry-forward would treat a NULL-time build row as "earliest" and
    // attach it to every probe — diverging from the join+rank encoding
    // (b.ts <= p.ts is never true for NULL) and from asofLookup.
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 11L, ts("2024-01-01 10:00:00")) // key 2 has ONLY a null-time build row
    ).toDF("user_id", "event_id", "ts")
    val build = Seq(
      (1L, 100L, Option.empty[Timestamp], "null-ts"),
      (1L, 101L, Option(ts("2024-01-01 09:00:00")), "real"),
      (2L, 102L, Option.empty[Timestamp], "null-ts")
    ).toDF("user_id", "event_id", "ts", "tag")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_event_id", $"asof_tag")
        .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val carry = rows(AsOf.asofJoin(probe, build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id"))
    val idx = AsOf.asofIndex(build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id")
    val lookup = rows(AsOf.asofLookup(probe, idx, "user_id", "ts",
      carryCols = Seq("event_id", "tag")))
    val expected = Map(10L -> ((101L, "real")), 11L -> ((null, null)))
    assert(carry == expected, s"carry-forward: $carry")
    assert(lookup == expected, s"lookup: $lookup")
  }

  test("null-KEY rows never match, in all three realizations") {
    // Window.partitionBy groups NULL keys into one partition — without
    // the build-side filter a null-key build row would carry onto
    // null-key probes, while the equi-join realizations never match
    // NULL = NULL. A null-key probe must fall through with null carry.
    val probe = Seq(
      (Option(1L), 10L, ts("2024-01-01 10:00:00")),
      (Option.empty[Long], 11L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val build = Seq(
      (Option(1L), 100L, ts("2024-01-01 09:00:00"), "real"),
      (Option.empty[Long], 101L, ts("2024-01-01 08:00:00"), "null-key")
    ).toDF("user_id", "event_id", "ts", "tag")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_event_id", $"asof_tag")
        .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val carry = rows(AsOf.asofJoin(probe, build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id"))
    val idx = AsOf.asofIndex(build, "user_id", "ts",
      carryCols = Seq("event_id", "tag"), buildTie = "event_id")
    val lookup = rows(AsOf.asofLookup(probe, idx, "user_id", "ts",
      carryCols = Seq("event_id", "tag")))
    val expected = Map(10L -> ((100L, "real")), 11L -> ((null, null)))
    assert(carry == expected, s"carry-forward: $carry")
    assert(lookup == expected, s"lookup: $lookup")
  }

  test("lookup realization (index + equi-join) equals the carry-forward on the events table") {
    val ev = Tables.events(spark, SfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_ts", $"asof_event_id")
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val carry = rows(AsOf.asofJoin(p, v, "user_id", "ts",
      carryCols = Seq("ts", "event_id"), buildTie = "event_id"))
    val idx = AsOf.asofIndex(v, "user_id", "ts",
      carryCols = Seq("ts", "event_id"), buildTie = "event_id")
    val lookup = rows(AsOf.asofLookup(p, idx, "user_id", "ts",
      carryCols = Seq("ts", "event_id")))
    assert(carry == lookup,
      s"carry-only ${(carry -- lookup).take(3)}, lookup-only ${(lookup -- carry).take(3)}")
  }

  test("plans one exchange on the key and no join") {
    val ev = Tables.events(spark, SfDir)
    val p = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val v = ev.filter($"event_type" === "view").select($"user_id", $"ts", $"event_id")
    val plan = AsOf.asofJoin(p, v, "user_id", "ts",
      carryCols = Seq("ts", "event_id"), buildTie = "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n${plan.take(600)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges")
  }
}
