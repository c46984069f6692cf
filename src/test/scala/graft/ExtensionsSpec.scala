package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers poly_hash for SQL users") {
    // getOrCreate would silently reuse another suite's session (without
    // our extensions) — detach the default first and restore it after.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // "ab" -> 97*31 + 98 = 3105
      val r = spark.sql("SELECT poly_hash('ab') AS h, poly_hash('ab', 31, 1000000007) AS h3").head()
      assert(r.getLong(0) == 3105L)
      assert(r.getLong(1) == 3105L)
      // non-string input casts at analysis instead of crashing codegen
      assert(spark.sql("SELECT poly_hash(12) AS h").head().getLong(0) ==
        spark.sql("SELECT poly_hash('12') AS h").head().getLong(0))
      // sketch aggregates resolve and agree with their typed forms
      val agg = spark.sql(
        """SELECT minhash_sketch(h, 4) AS mh, simhash_sketch(h) AS sh
          |FROM (SELECT xxhash64(x) AS h FROM (VALUES ('a'), ('b'), ('c')) t(x))""".stripMargin).head()
      assert(agg.getSeq[Long](0).length == 4)
      import org.apache.spark.sql.functions.{col, xxhash64}
      import spark.implicits._
      val typed = Seq("a", "b", "c").toDF("x").select(xxhash64(col("x")).as("h"))
        .agg(graft.functions.expressions.MinHashSketch(col("h"), 4).as("mh"),
          graft.functions.expressions.SimHashSketch(col("h")).as("sh")).head()
      assert(agg.getSeq[Long](0) == typed.getSeq[Long](0) && agg.getLong(1) == typed.getLong(1))
      // sorted-map intersect: blocks {0: 0b1011} ∩ {0: 0b0011, 1: 0b1} = 2 bits
      val bits = spark.sql(
        "SELECT sorted_map_bit_intersect(map(0, 11L), map(0, 3L, 1, 1L)) AS n").head()
      assert(bits.getInt(0) == 2)
      // round-3 natives resolve through SQL and match their kernels
      val r3 = spark.sql(
        """SELECT
          |  normalize_taxonomy_ids(array('human_situation:a', ' human_situations:b;', 'human_situations')) AS norm,
          |  taxonomy_parents(array('a:b:c')) AS par,
          |  format_phone_numbers('0521234567') AS ph,
          |  shingles(array('x', 'y', 'z'), 2) AS sh,
          |  media_feature_fold(cast('ab' AS BINARY), 2) AS mf
          |""".stripMargin).head()
      assert(r3.getSeq[String](0) == Seq("human_situations:a", "human_situations:b"))
      assert(r3.getSeq[String](1) == Seq("a:b", "a:b:c"))
      assert(r3.getSeq[String](2) == Seq("052-123-4567"))
      assert(r3.getSeq[String](3) == Seq("x y", "y z"))
      assert(r3.getSeq[Float](4).length == 2)
      // quantizer: [1.0, -0.5] -> scale 127, codes "127,-64" (half away)
      assert(spark.sql("SELECT quantize_int8_csv(array(1.0F, -0.5F)) AS q")
        .head().getString(0) == "127,-64")
      // null ELEMENTS quantize to code 0 (codegen and interpreted agree;
      // reachable via the SQL registry on containsNull arrays)
      assert(spark.sql("SELECT quantize_int8_csv(array(1.0F, NULL, -0.5F)) AS q")
        .head().getString(0) == "127,0,-64")
      // r8 native: the fused html-table parse resolves through SQL and
      // emits the unpivoted structs (header-only table -> empty array)
      val ht = spark.sql(
        """SELECT html_table_parse(
          |  '<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td></td></tr></table>') AS c,
          |  html_table_parse('<table><tr><th>a</th></tr></table>') AS empty
          |""".stripMargin).head()
      val cells = ht.getSeq[org.apache.spark.sql.Row](0)
      assert(cells.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))) ==
        Seq((1L, 1L, "a", "1"), (1L, 2L, "b", "")))
      assert(ht.getSeq[org.apache.spark.sql.Row](1).isEmpty)
      // a literal arg above Int.MaxValue reports cleanly instead of
      // wrapping to a nonsense (negative) k via .toInt
      val overflow = intercept[Exception] {
        spark.sql("SELECT minhash_sketch(h, 5000000000) AS mh FROM (SELECT xxhash64('a') AS h)").head()
      }
      assert(overflow.getMessage.contains("fit in a 32-bit int"),
        s"got: ${overflow.getMessage}")
    } finally {
      // Don't stop(): the SparkContext is JVM-global and shared with the
      // other suites' session; just restore the session handles.
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
