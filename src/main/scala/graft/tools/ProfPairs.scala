package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.functions.F

/** Stage-by-stage cost of q118's co-occurrence pipeline at sf0.1 —
  * which step actually costs: tokenize, explode, vocab agg, the
  * per-doc (tok, c) re-group, or the pair explode + pair agg.
  */
object ProfPairs {
  private def time(label: String)(df: => DataFrame): Long = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"RESULT $label ms=$ms")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val docs = Tables.documents(spark, dir)
    def docToks = docs.select(col("doc_id"),
      array_distinct(filter(F.tokens(col("text")), t => length(t) >= 3)).as("toks"))
    def dt = docToks.select(col("doc_id"), explode(col("toks")).as("tok"))
    def dfreq = dt.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    def grouped = dt.join(dfreq.filter(col("c") >= 5), "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("c")))).as("ts"))
    def pairHof = flatten(expr(
      """transform(ts, (x, i) ->
        |  transform(slice(ts, i + 2, size(ts)), y ->
        |    struct(x.tok AS tok_a, y.tok AS tok_b, x.c AS ca, y.c AS cb)))
        |""".stripMargin))
    def pairsExploded = grouped.select(explode(pairHof).as("p"))
    def full = pairsExploded
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).cast("long").as("c_ab"),
        min(col("p.ca")).cast("long").as("c_a"),
        min(col("p.cb")).cast("long").as("c_b"))
      .filter(col("c_ab") >= 5)

    // variant: two codegen'd Generate nodes (posexplode + explode over a
    // slice) instead of the interpreted nested-transform HOF
    def pairsDouble = grouped
      .select(col("ts"), posexplode(col("ts")).as(Seq("i", "x")))
      .select(col("x"), explode(slice(col("ts"), col("i") + lit(2),
        greatest(size(col("ts")) - col("i") - 1, lit(0)))).as("y"))
    def fullDouble = pairsDouble
      .groupBy(col("x.tok").as("tok_a"), col("y.tok").as("tok_b"))
      .agg(count(lit(1)).cast("long").as("c_ab"),
        min(col("x.c")).cast("long").as("c_a"),
        min(col("y.c")).cast("long").as("c_b"))
      .filter(col("c_ab") >= 5)

    // variant: plain self-join on doc_id (the first cut)
    def dtKept = dt.join(dfreq.filter(col("c") >= 5), "tok")
    def fullJoin = {
      val a = dtKept.select(col("doc_id"), col("tok").as("tok_a"), col("c").as("ca"))
      val b = dtKept.select(col("doc_id").as("doc_id_b"), col("tok").as("tok_b"),
        col("c").as("cb"))
      a.join(b, col("doc_id") === col("doc_id_b") && col("tok_a") < col("tok_b"))
        .groupBy(col("tok_a"), col("tok_b"))
        .agg(count(lit(1)).cast("long").as("c_ab"),
          min(col("ca")).cast("long").as("c_a"),
          min(col("cb")).cast("long").as("c_b"))
        .filter(col("c_ab") >= 5)
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("docToks")(docToks)
      time("dt_explode")(dt)
      time("dfreq")(dfreq)
      time("grouped")(grouped)
      time("pairs_exploded")(pairsExploded)
      time("full")(full)
      time("pairs_double")(pairsDouble)
      time("full_double")(fullDouble)
      time("full_join")(fullJoin)
    }
    spark.stop()
  }
}

/** rsd sweep for the one-pass approx profiler: the HLL++ buffer is
  * ceil(2^p / 10) LONG aggregation-buffer slots PER COLUMN (6-bit
  * registers, ~10 packed per long; rsd 0.02 → p=12 → ~410 longs × 11
  * columns ≈ 4.5k buffer attributes — far past the ~100-field codegen
  * cutoff), so precision trades directly against the aggregate's row
  * width. Measures time + worst actual NDV error per rsd.
  */
object ProfHllRsd {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val li = graft.Tables.lineitem(spark, dir)
    val exact = graft.operators.Profile.profile(li, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (rsd <- Seq(0.02, 0.05, 0.1); round <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Profile.profileApprox(li, cols, rsd)
        .write.format("noop").mode("overwrite").save()
      val ms = (System.nanoTime() - t0) / 1000000
      val errs = graft.operators.Profile.profileApprox(li, cols, rsd)
        .collect().map { r =>
          val e = exact(r.getString(0)).toDouble
          math.abs(r.getLong(3) - e) / math.max(e, 1.0)
        }
      println(f"RESULT rsd=$rsd round=$round ms=$ms worst_err=${errs.max}%.4f")
    }
    spark.stop()
  }
}
