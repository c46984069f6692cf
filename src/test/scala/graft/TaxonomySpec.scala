package graft

import org.apache.spark.sql.functions._
import graft.functions.F

/** Pins normalize_taxonomy_ids semantics (to_dp.py:116) on a handcrafted
  * messy input: comma splits, space-smashed ids, singular-root
  * canonicalization, strip, bare-root drop, first-appearance dedup. */
class TaxonomySpec extends SpecBase {
  import spark.implicits._

  test("normalizeTaxonomyIds reproduces the reference's emit rules in order") {
    val input = Seq(
      "human_situation:age_group:adults",                     // singular -> canonical
      "human_situations:a,human_situations:b",                // comma concat
      "human_situations:x_1:deep human_situations:y_2",       // space-smashed
      "human_situations",                                     // bare root -> dropped
      " human_situations:pad; ",                              // strip both ends
      "\thuman_situations:tabbed\t",                          // Python strip() removes tabs too
      "human_situations:a",                                   // duplicate -> deduped
      ""                                                      // empty -> dropped
    )
    val got = Seq(Tuple1(input)).toDF("ids")
      .select(F.normalizeTaxonomyIds(col("ids")).as("norm"))
      .head().getSeq[String](0)
    assert(got == Seq(
      "human_situations:age_group:adults",
      "human_situations:a",
      "human_situations:b",
      "human_situations:x_1:deep",
      "human_situations:y_2",
      "human_situations:pad",
      "human_situations:tabbed"))
  }

  test("null and empty arrays normalize to empty") {
    val df = Seq(Tuple1(Option.empty[Seq[String]]), Tuple1(Some(Seq.empty[String]))).toDF("ids")
    val got = df.select(F.normalizeTaxonomyIds(col("ids")).as("n")).collect()
    assert(got.forall(_.getSeq[String](0).isEmpty))
  }

  test("native expression equals the HOF composition on randomized messy inputs") {
    val rnd = new scala.util.Random(20260812L)
    val frags = Seq(
      "human_situations:a", "human_situation:b:c", "human_situations", "",
      " human_situations:pad ;", "human_situations:x human_situations:y",
      "human_situation:z", ",,", "plain_token", "  ", "\thuman_situations:t\t",
      "human_situations:a,human_situation:q", ";human_situations:semi",
      "human_situations:deep:er:est", "human_situations:x,", "צירוף חופשי")
    val rows = Seq.fill(300) {
      Tuple1(Seq.fill(1 + rnd.nextInt(6)) {
        // random fragments, sometimes comma-joined into one element
        if (rnd.nextBoolean()) frags(rnd.nextInt(frags.size))
        else s"${frags(rnd.nextInt(frags.size))},${frags(rnd.nextInt(frags.size))}"
      })
    }
    val df = rows.toDF("ids")
    val diff = df.select(
      F.normalizeTaxonomyIds(col("ids")).as("native"),
      F.normalizeTaxonomyIdsHof(col("ids")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
    // parents expansion: native TreeSet pass vs HOF slice/join chain,
    // downstream of the (native) normalizer like the q11/q47 call sites
    val pdiff = df.select(
      F.taxonomyParents(F.normalizeTaxonomyIds(col("ids"))).as("native"),
      F.taxonomyParentsHof(F.normalizeTaxonomyIds(col("ids"))).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(pdiff.count() == 0)
  }
}
