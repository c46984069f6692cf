package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.FreqItemsSketch

/** The Misra-Gries heavy-hitters aggregate: exact when capacity covers the
  * vocabulary (the regime q98's DuckDB oracle pins), and within the
  * classic MG bounds when it doesn't — across real partial/merge plans
  * (multi-partition input, map-side partials, shuffle serde).
  */
class FreqItemsSpec extends SpecBase {
  import spark.implicits._

  test("capacity >= distinct items reproduces exact counts across merges") {
    // 3 groups x 40 distinct tokens, skewed multiplicities, 8 input
    // partitions so partial buffers serialize and merge for every group
    val df = spark.range(0, 60000, 1, 8)
      .select((col("id") % 3).as("g"),
        concat(lit("t"), (col("id") % 40) * (col("id") % 40) % 97).as("tok"))
      .cache()
    val got = df.groupBy($"g").agg(FreqItemsSketch($"tok", 64, 5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.tok", $"col.cnt")
      .as[(Long, Long, String, Long)].collect().toSet
    val want = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
        .orderBy($"cnt".desc, $"tok")
      df.groupBy($"g", $"tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
        .select($"g", $"rank".cast("long"), $"tok", $"cnt")
        .as[(Long, Long, String, Long)].collect().toSet
    }
    assert(got == want, s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    df.unpersist()
  }

  test("undercapacity keeps every true heavy hitter within the MG bound") {
    // n=100k over ~5k distinct tokens at capacity 8: bound = n/(cap+1).
    // hot0/hot1 carry 25k each (far above the bound) and MUST survive;
    // every reported estimate obeys est <= true and true - est <= bound.
    val n = 100000L
    val cap = 8
    val df = spark.range(0, n, 1, 8)
      .select(when(pmod(col("id"), lit(4)) < 2, concat(lit("hot"), pmod(col("id"), lit(2))))
        .otherwise(concat(lit("cold"), pmod(col("id"), lit(5000)))).as("tok"))
      .cache()
    val reported = df.agg(FreqItemsSketch($"tok", cap, cap).as("top"))
      .select(explode($"top")).select($"col.tok", $"col.cnt")
      .as[(String, Long)].collect().toMap
    val truth = df.groupBy($"tok").count().as[(String, Long)].collect().toMap
    val bound = n / (cap + 1)
    for ((tok, est) <- reported) {
      val t = truth(tok)
      assert(est <= t, s"$tok overestimated: $est > $t")
      assert(t - est <= bound, s"$tok undercount ${t - est} exceeds n/(cap+1)=$bound")
    }
    for (hot <- Seq("hot0", "hot1"))
      assert(reported.contains(hot), s"true heavy hitter $hot lost (reported=${reported.keys})")
    df.unpersist()
  }

  test("freq_items_sketch is callable from SQL and plans map-side partials") {
    spark.range(0, 1000, 1, 4)
      .select((col("id") % 2).as("g"), concat(lit("w"), col("id") % 7).as("tok"))
      .createOrReplaceTempView("fi_toks")
    val df = spark.sql(
      "SELECT g, freq_items_sketch(tok, 32, 3) AS top FROM fi_toks GROUP BY g")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert("partial_freq_items_sketch".r.findFirstIn(plan).isDefined,
      s"no map-side partial sketch in:\n${plan.take(600)}")
    val rows = df.select($"g", explode($"top")).collect()
    assert(rows.length == 6) // 2 groups x top-3 of 7 distinct
  }

  test("bottom_k_sample equals the TopKPerKey route and plans map-side partials") {
    // The aggregate is q103's streaming-legal realization; on identical
    // input the two encodings must pick identical (key, payload) sets
    // with identical ranks. 8 input partitions force real partial
    // merges + shuffle serde through the PriorityQueue buffer.
    import graft.operators.TopK
    val df = spark.range(0, 50000, 1, 8)
      .select((col("id") % 7).as("g"),
        xxhash64(col("id"), lit("smp")).as("h"), col("id"))
      .cache()
    df.createOrReplaceTempView("bks_input")

    val viaSql = spark.sql(
      """SELECT g, smp.id AS id, CAST(pos + 1 AS BIGINT) AS rk
        |FROM (SELECT g, bottom_k_sample(h, id, 15) AS arr FROM bks_input GROUP BY g)
        |LATERAL VIEW posexplode(arr) AS pos, smp""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet

    val viaNode = TopK.topKWithRank(df.toDF(), col("g"), Seq(col("h"), col("id")), k = 15,
        rankName = "rk")
      .select(col("g"), col("id"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

    assert(viaSql.size == 7 * 15)
    assert(viaSql == viaNode,
      s"sql-only: ${(viaSql -- viaNode).take(5)}, node-only: ${(viaNode -- viaSql).take(5)}")

    // partial merge must appear (ObjectHashAggregate partial_bottom_k_sample)
    val plan = spark.sql(
      "SELECT g, bottom_k_sample(h, id, 15) FROM bks_input GROUP BY g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottom_k_sample"),
      s"expected a map-side partial phase:\n${plan.take(600)}")
    df.unpersist()
  }
}
