package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Measurement behind the fused HtmlTableParse Expression (q157's
  * parse): the composed regexp_extract_all → posexplode × 2 chain vs
  * the one-pass struct emitter, on a 600k-document frame shaped like
  * the q157 fixture (3-column tables, 0-3 data rows, attribute and
  * decoy arms). The sf1 probe showed the composed chain's per-row task
  * time drifting 1.9× at 10× rows — allocation/GC pressure from the
  * intermediate row/cell arrays — which is what the fused form removes.
  * Run: `sbt "runMain graft.tools.ProfHtml"`. */
object ProfHtml {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = col("id")
    def dataRow(off: Int): org.apache.spark.sql.Column = concat(
      when(p % 6 === 0, lit("<tr class=\"r\"><td align=\"c\">")).otherwise(lit("<tr><td>")),
      lit("n"), ((p + off) % 50).cast("string"),
      lit("</td><td>"), ((p * off) % 9).cast("string"), lit("</td><td>"),
      when((p + off) % 3 === 0, lit("")).otherwise(concat(lit("C"), ((p + off) % 20).cast("string"))),
      lit("</td></tr>"))
    val docs = spark.range(600000).select(p.as("doc_id"), concat(
      lit("<html><p>j</p><table id=\"t\"><tr>"),
      when(p % 2 === 0, lit("<th>name</th><th>qty</th><th>city</th>"))
        .otherwise(lit("<td>name</td><td>qty</td><td>city</td>")), lit("</tr>"),
      when(p % 4 >= 1, dataRow(1)).otherwise(lit("")),
      when(p % 4 >= 2, dataRow(2)).otherwise(lit("")),
      when(p % 4 >= 3, dataRow(3)).otherwise(lit("")),
      lit("</table>"),
      when(p % 5 === 0, lit("<table><tr><td>zz</td></tr></table>")).otherwise(lit("")),
      lit("</html>")).as("html"))
      .localCheckpoint(true)
    def run(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    // interleaved twice: ambient drift shows up as run1/run2 disagreement
    run("composed", graft.operators.HtmlTable.extractComposed(docs))
    run("fused   ", graft.operators.HtmlTable.extract(docs))
    run("composed", graft.operators.HtmlTable.extractComposed(docs))
    run("fused   ", graft.operators.HtmlTable.extract(docs))
    spark.stop()
  }
}
