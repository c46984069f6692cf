package graft

import org.apache.spark.sql.functions._
import graft.functions.F

/** Pins the round-3 row-transform kernels on handcrafted edges the table
  * derivations don't reach: fix_situations (to_dp.py:99), address
  * selection/validation (to_dp.py:231, helpers.py:79), the geometry bbox
  * gate (helpers.py:69), stop-word stripping (autocomplete.py:58) and
  * branch short names (helpers.py:61). */
class SituationsSpec extends SpecBase {
  import spark.implicits._

  private def fix(ids: Seq[String]): Seq[String] =
    Seq(Tuple1(ids)).toDF("ids")
      .select(F.fixSituations(col("ids")).as("out")).head().getSeq[String](0)

  test("fixSituations reproduces the reference's three rules in order") {
    val women = "human_situations:gender:women"
    val men = "human_situations:gender:men"
    val hebrew = "human_situations:language:hebrew_speaking"
    val arabs = "human_situations:sectors:arabs"
    val arabic = "human_situations:language:arabic_speaking"
    // both genders -> both removed; a lone gender survives
    assert(fix(Seq("x", women, men, "y")) == Seq("x", "y"))
    assert(fix(Seq("x", women)) == Seq("x", women))
    // hebrew always dropped
    assert(fix(Seq(hebrew, "x")) == Seq("x"))
    // arabs/bedouin append arabic at the END, once
    assert(fix(Seq(arabs, "x")) == Seq(arabs, "x", arabic))
    assert(fix(Seq(arabs, arabic, "x")) == Seq(arabs, arabic, "x"))
    // empty passes through; all rules compose
    assert(fix(Seq.empty) == Seq.empty)
    assert(fix(Seq(women, men, hebrew, arabs)) == Seq(arabs, arabic))
  }

  test("fixSituations passes null through as null") {
    val out = Seq(Tuple1(Option.empty[Seq[String]])).toDF("ids")
      .select(F.fixSituations(col("ids")).as("out")).head()
    assert(out.isNullAt(0))
  }

  test("selectAddress takes the first no-English candidate; validGeometry gates arity and bbox") {
    val df = Seq(
      ("Eng street", "רחוב א", "עיר", Some(Seq(34.5, 31.5)), "רחוב א", true),
      (null, null, "City", None, null, false),
      ("רחוב ב", "ignored", "עיר", Some(Seq(34.5)), "רחוב ב", false),
      (null, "шдерот 5", "עיר", Some(Seq(40.0, 31.5)), "шдерот 5", false)
    ).toDF("a", "b", "c", "geom", "want_addr", "want_geo")
    val got = df.select(
      F.selectAddress(col("a"), col("b"), col("c")).as("addr"),
      F.validGeometry(col("geom")).as("geo"),
      col("want_addr"), col("want_geo")).collect()
    got.foreach { r =>
      assert(Option(r.getString(0)) == Option(r.getString(2)), s"address: $r")
      assert(r.getBoolean(1) == r.getBoolean(3), s"geometry: $r")
    }
  }

  test("removeStopWords strips exact tokens only; branchShortName prefers curated non-empty") {
    val out = Seq(Tuple1("שירותים עבור ילדים של העיר"))
      .toDF("s")
      .select(F.removeStopWords(col("s"), Seq("עבור", "של", "באיזור")).as("q")).head().getString(0)
    assert(out == "שירותים ילדים העיר")
    val names = Seq(("Full Name", "Short"), ("Full Name", ""), ("Full Name", null))
      .toDF("full", "short")
      .select(F.branchShortName(col("full"), col("short"))).as[String].collect()
    assert(names.toSeq == Seq("Short", "Full Name", "Full Name"))
  }
}
