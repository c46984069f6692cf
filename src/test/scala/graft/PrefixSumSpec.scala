package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** Pins PrefixSum.runningSum / rowNumber row-for-row against the
  * monolithic window they replace — including the shape that motivates
  * them (90% of rows under ONE partition key) and bucket widths that
  * exercise empty buckets, single-row buckets, and cross-bucket
  * boundaries. */
class PrefixSumSpec extends SpecBase {
  import spark.implicits._

  private def skewed = {
    // 90% lang "en", zero-value rows, gaps in the id space
    val rows = (0L until 900L).map(i => (i * 3 + 1, "en", i % 7)) ++
      (0L until 60L).map(i => (i * 41 + 2, "de", i % 5)) ++
      (0L until 40L).map(i => (i * 53 + 4, "fr", 0L))
    rows.toDF("doc_id", "lang", "v")
  }

  test("runningSum ≡ window cumsum on a 90%-one-key frame, several widths") {
    val df = skewed
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
    val expected = df.withColumn("cum", sum($"v").over(w))
      .select($"doc_id", $"lang", $"cum").collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    for (width <- Seq(1L, 7L, 64L, 100000L)) {
      val got = PrefixSum.runningSum(df, Seq("lang"),
          expr(s"doc_id div $width"), Seq($"doc_id"), $"v", "cum")
        .select($"doc_id", $"lang", $"cum").collect()
      assert(got.length == 1000)
      got.foreach { r =>
        val k = (r.getLong(0), r.getString(1))
        assert(r.getLong(2) == expected(k), s"width=$width mismatch at $k")
      }
    }
  }

  test("rowNumber ≡ row_number with a multi-column order (the q82 shape)") {
    val df = skewed.withColumn("h", pmod(hash($"doc_id"), lit(1000)).cast("long"))
    val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
    val expected = df.withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"lang", $"pos").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // bucket derives from the LEADING order column — monotone in (h, doc_id)
    val got = PrefixSum.rowNumber(df, Seq("lang"), expr("h div 16"),
        Seq($"h", $"doc_id"), "pos")
      .select($"doc_id", $"lang", $"pos").collect()
    assert(got.length == 1000)
    got.foreach(r => assert(r.getLong(2) == expected((r.getLong(0), r.getString(1)))))
  }

  test("empty frame and single-part frame stay well-formed") {
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "v")
    assert(PrefixSum.runningSum(empty, Seq("lang"), expr("doc_id div 4"),
      Seq($"doc_id"), $"v", "cum").count() == 0)
    val one = Seq((5L, "en", 3L), (9L, "en", 2L)).toDF("doc_id", "lang", "v")
    val r = PrefixSum.runningSum(one, Seq("lang"), expr("doc_id div 4"),
      Seq($"doc_id"), $"v", "cum").orderBy($"doc_id")
      .select($"cum").as[Long].collect()
    assert(r.toSeq == Seq(3L, 5L))
  }
}
