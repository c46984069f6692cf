package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SpecBase {
  import spark.implicits._

  test("fingerprint matches the polynomial definition exactly") {
    // "ab" -> ((0*31+97)*31+98) % 1e9+7 = 3105
    val out = Seq((1L, "ab")).toDF("id", "text")
      .select(TextAnalysis.fingerprint($"text")).head().getLong(0)
    assert(out == 97L * 31 + 98)
  }

  test("native PolyHash expression agrees with the HOF reference on real docs") {
    val docs = Tables.documents(spark, SfDir)
    val mismatches = docs.select(
      TextAnalysis.fingerprint($"text").as("native"),
      TextAnalysis.fingerprintHof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("fingerprint normalizes whitespace and case first") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("stopwordRatio counts occurrences, not distinct hits") {
    val r = Seq((1L, "the the cat")).toDF("id", "text")
      .select(TextAnalysis.stopwordRatio(F.tokens($"text"))).head().getDouble(0)
    assert(math.abs(r - 2.0 / 3.0) < 1e-12)
  }

  test("bpeTokenCount splits letter runs, digit runs, and symbols") {
    val n = Seq((1L, "ab 12 cd!")).toDF("id", "text")
      .select(TextAnalysis.bpeTokenCount($"text")).head().getLong(0)
    assert(n == 4) // ab, 12, cd, !
  }

  test("minShingleFingerprint is stable and order-sensitive") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"), (3L, "j i h g f e d c b a")).toDF("id", "text")
    val fps = df.orderBy("id").select(TextAnalysis.minShingleFingerprint(F.tokens($"text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("langIdPrediction thresholds on ratio") {
    val df = Seq((1L, "the of and cat"), (2L, "cat dog fish bird")).toDF("id", "text")
    val out = df.orderBy("id")
      .select(TextAnalysis.langIdPrediction(TextAnalysis.stopwordRatio(F.tokens($"text")))).collect()
    assert(out(0).getString(0) == "en" && out(1).getString(0) == "unknown")
  }
}
