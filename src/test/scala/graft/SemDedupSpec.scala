package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** SemDeDup (q161) beyond the oracle gate: the oracle runs the operator
  * over the GIVEN label assignment (SQL-expressible); this spec runs the
  * SAME operator over LEARNED IVF cells — the paper's actual k-means
  * setting — and re-derives the keep rule independently.
  */
class SemDedupSpec extends SpecBase {

  /** (id, cluster, embedding) from the learned coarse quantizer. */
  private def assignedIvf = Similarity
    .ivfIndex(Tables.embeddings(spark, SfDir), nLists = 8, seed = 42L, trainMod = 2)
    .assigned
    .select(col("vec_id").as("id"), col("cell").cast("long").as("cluster"),
      col("embedding"))

  test("over learned cells: partition of the corpus, one keep per group, no cross-cluster group") {
    val out = Similarity.semDedup(assignedIvf, tau = 0.3).collect()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(out.length == n, "every input id must come out exactly once")
    assert(out.map(_.getAs[Long]("id")).distinct.length == out.length)
    out.groupBy(_.getAs[Long]("grp")).foreach { case (g, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) == 1,
        s"grp $g must keep exactly one member")
      assert(rows.forall(_.getAs[Long]("n_dup") == rows.length),
        s"grp $g: n_dup must equal the group size")
      // pairs are discovered within a cell, and CC over within-cell
      // edges can never chain across cells — the paper's tractability
      // argument must be visible in the output
      assert(rows.map(_.getAs[Long]("cluster")).distinct.length == 1,
        s"grp $g spans clusters")
    }
  }

  test("the keep rule is the paper's: the kept member is FARTHEST from its cluster centroid") {
    val out = Similarity.semDedup(assignedIvf, tau = 0.3).collect()
    // independent replay of the centroid + cosine math (same 4dp
    // rounding, same index-order fold as ArrayDot)
    val rows = assignedIvf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val cents = rows.groupBy(_._2).map { case (c, xs) =>
      c -> Array.tabulate(xs.head._3.length) { i =>
        math.rint(xs.map(_._3(i)).sum / xs.length * 10000) / 10000
      }
    }
    val cosC = rows.map { case (id, c, e) =>
      val ct = cents(c)
      val d = e.zip(ct).map { case (a, b) => a * b }.sum
      val n = math.sqrt(e.map(x => x * x).sum) * math.sqrt(ct.map(x => x * x).sum)
      id -> math.rint(d / n * 10000) / 10000
    }.toMap
    out.groupBy(_.getAs[Long]("grp")).foreach { case (g, members) =>
      val kept = members.filter(_.getAs[Boolean]("keep")).head.getAs[Long]("id")
      val want = members.map(_.getAs[Long]("id")).minBy(id => (cosC(id), id))
      assert(kept == want,
        s"grp $g kept $kept but argmin(cos_to_centroid, id) is $want")
    }
  }

  test("tau monotonicity: a stricter threshold never keeps fewer docs") {
    val loose = Similarity.semDedup(assignedIvf, tau = 0.2)
      .filter(col("keep")).count()
    val strict = Similarity.semDedup(assignedIvf, tau = 0.5)
      .filter(col("keep")).count()
    assert(strict >= loose, s"tau 0.5 keeps $strict < tau 0.2 keeps $loose")
    // and the dedup is REAL on this corpus at the loose threshold
    val n = Tables.embeddings(spark, SfDir).count()
    assert(loose < n, "tau 0.2 must merge at least one duplicate group")
  }
}
