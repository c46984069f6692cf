package graft

import graft.operators.Profile

/** The table profiler: exact and approx forms agree (within the HLL
  * bound), and the approx form is genuinely one-pass. */
class ProfileSpec extends SpecBase {

  private val Cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

  test("approx profile matches the exact profile within the sketch bound") {
    val exact = Profile.profile(Tables.lineitem(spark, SfDir), Cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.profileApprox(Tables.lineitem(spark, SfDir), Cols)
      .collect().map(r => r.getString(0) -> r).toMap // default rsd = 0.05
    assert(exact.keySet == Cols.toSet && approx.keySet == Cols.toSet)
    for (c <- Cols) {
      val (e, a) = (exact(c), approx(c))
      // counts, nulls, min/max renders are exact in both forms
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      assert(e.getString(4) == a.getString(4) && e.getString(5) == a.getString(5))
      val (en, an) = (e.getLong(3), a.getLong(3))
      // 3×rsd bound (≈3σ for HLL++ at the 0.05 default)
      assert(math.abs(en - an) <= math.max(1L, (en * 0.15).toLong),
        s"$c: approx ndv $an vs exact $en beyond 3×rsd")
    }
  }

  test("constraint checks count manufactured dups, orphans, and null FKs") {
    import spark.implicits._
    import graft.operators.Constraints
    // the warehouse tables are clean (q105 reads all zeros), so the
    // violation arms need dirty data to prove they actually count
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),
      (4L, None), (5L, Some(20L))).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val dupes = Seq(1L, 1L, 2L, 3L, 3L, 3L, 4L).toDF("k")

    val fk = Constraints.referential(child, "fk", parent, "pk", "fk_test")
      .as[(String, Long, Long)].head()
    assert(fk == (("fk_test", 5L, 2L)), s"orphan 99 + null fk must both violate: $fk")

    val pk = Constraints.uniqueKey(dupes, "k", "pk_test")
      .as[(String, Long, Long)].head()
    assert(pk == (("pk_test", 4L, 2L)), s"keys 1 and 3 are dup'd of 4 distinct: $pk")
  }

  test("approx profile is one scan, no join, no unpivot exchange") {
    val p = Profile.profileApprox(Tables.lineitem(spark, SfDir), Cols)
      .queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(l => l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scans == 1, s"expected a single scan, got $scans")
    assert(!p.contains("Join"), "one aggregate row needs no join")
  }
}
