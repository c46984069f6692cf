package graft

import org.apache.spark.sql.functions._

/** Pins q149's rank-quality scoring against an independent single-
  * threaded replay of run_single_benchmark's loop semantics (the BpeSpec
  * posture: the twin is plain Scala, no Spark, written from the
  * reference's control flow — majority vote with Counter's insertion-
  * order tie-break, 0.89^i discount, two enumerate()s with repeating
  * positions). */
class BenchmarkSpec extends SpecBase {
  import spark.implicits._

  // the same mod-5 decision mapping the fixture derives ids from
  private def dec(x: Long): Option[String] = (((x % 5) + 5) % 5) match {
    case 0 | 4 => Some("Good")
    case 1 => Some("Bad")
    case 2 => Some("Neutral")
    case _ => None
  }

  private def referenceScore(qn: Long): Double = {
    var total = 0.0
    var score = 0.0
    for (l <- 0 to 1) {
      val n = if (l == 0) 3 + qn % 5 else 2 + qn % 4
      for (i <- 0L until n) {
        val sid = (qn * 31 + l * 17 + i * 7) % 90
        val oid = (qn * 13 + l * 5 + i * 3) % 70
        val nr = i % 3
        val ns = i % 2
        val decs = (
          Seq(dec(qn + sid * 2), dec(qn + oid * 3 + 1)) ++
            (0L until nr).map(r => dec(qn + ((qn + i * 11 + r * 29) % 80) * 5 + 2)) ++
            (0L until ns).map(_ => dec(qn + ((qn * 7 + i * 13) % 40) * 7 + 3))
          ).flatten.filterNot(_ == "Neutral")
        val ind = math.pow(0.89, i.toDouble)
        total += ind
        if (decs.nonEmpty) {
          // Counter.most_common(1): max count, insertion order on ties
          val top = decs.distinct.maxBy(k => (decs.count(_ == k), -decs.indexOf(k)))
          score += (if (top == "Good") ind else -ind)
        }
      }
    }
    BigDecimal(100.0 * score / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q149 scores equal the single-threaded reference replay for every query") {
    // responses cover only r<2 in the engine (nr ≤ 2 means r ∈ {0,1}) —
    // same in the replay by construction of nr = i % 3
    val got = SparkEntry.queries("q149_benchmark_score")(spark, SfDir)
      .select(regexp_extract($"query", "([0-9]+)$", 1).cast("long").as("qn"), $"score")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 120)
    got.foreach { case (qn, s) =>
      val expect = referenceScore(qn)
      assert(math.abs(s - expect) < 1e-9, s"qn=$qn got=$s expect=$expect")
    }
  }

  test("q149 fixture exercises every vote arm") {
    val plans = SparkEntry.queries("q149_benchmark_score")(spark, SfDir).cache()
    try {
      val scores = plans.select($"score").as[Double].collect()
      assert(scores.exists(_ > 0) && scores.exists(_ < 0),
        "need both net-Good and net-Bad queries for the vote arms to be exercised")
      val sugg = plans.select($"suggestion").collect()
      assert(sugg.exists(_.isNullAt(0)) && sugg.exists(!_.isNullAt(0)),
        "need both suggestion and no-suggestion arms")
    } finally plans.unpersist()
  }

  test("q150 keeps the reference's skip-ladder quirks") {
    val out = SparkEntry.queries("q150_benchmark_history")(spark, SfDir)
      .select($"score").as[Option[Double]].collect()
    // falsy-score skip: no emitted row may carry score NULL or 0.0
    assert(out.forall(s => s.exists(_ != 0.0)), "falsy scores must be skipped")
    assert(out.nonEmpty)
  }
}
