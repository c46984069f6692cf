package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.F
import graft.functions.expressions.PolyHash
import graft.operators.GeoMath

/** Property-based checks for the pure-function kernels: laws that must
  * hold on ANY input, not just the synthetic tables — idempotence,
  * round-trips, and native-vs-reference-form equivalence on random data.
  * (Spark evaluation is batched: each property collects its generated
  * cases and runs them through one DataFrame pass.)
  */
class PropertySpec extends SpecBase {
  import spark.implicits._

  // Deterministic sampling: same cases every run (no flaky CI), still
  // structurally random inputs rather than hand-picked examples.
  private def cases[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("generator failed"))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('\t'),
      1 -> Gen.const(','), 1 -> Gen.const(':'))).map(_.mkString)

  test("normalizeTaxonomyIds is idempotent and never emits empties or the bare root") {
    val rawId: Gen[String] = Gen.oneOf(
      Gen.const("human_situations"),
      Gen.const(""),
      asciiText.map(s => "human_situation:" + s.replace(" ", "_")),
      asciiText.map(s => "human_situations:" + s.replace(" ", "_")),
      Gen.zip(asciiText, asciiText).map { case (a, b) =>
        s"human_situations:${a.replace(" ", "_")},human_situations:${b.replace(" ", "_")}" },
      Gen.zip(asciiText, asciiText).map { case (a, b) =>
        s"human_situations:${a.replace(" ", "_")} human_situations:${b.replace(" ", "_")}" })
    val inputs = cases(Gen.listOfN(4, rawId), 60)
    val df = inputs.map(Tuple1(_)).toDF("ids")
      .select(F.normalizeTaxonomyIds(col("ids")).as("once"))
      .select(col("once"), F.normalizeTaxonomyIds(col("once")).as("twice"))
    val rows = df.collect()
    rows.foreach { r =>
      val once = r.getSeq[String](0); val twice = r.getSeq[String](1)
      assert(once == twice, s"not idempotent: $once vs $twice")
      assert(!once.contains("") && !once.contains("human_situations"))
      assert(once.distinct == once, "dedup must hold")
    }
  }

  test("formatPhoneNumbers output entries are grouped digits or the trimmed original") {
    val entry: Gen[String] = Gen.oneOf(
      Gen.chooseNum(100000000L, 999999999L).map(n => "0" + n.toString.drop(1)),
      Gen.chooseNum(1000000L, 9999999L).map(n => s"+972 52 $n"),
      Gen.chooseNum(0L, 999999L).map(n => f"1800$n%06d"),
      asciiText)
    val raws = cases(Gen.listOfN(3, entry).map(_.mkString("\n")), 80)
    val rows = raws.map(Tuple1(_)).toDF("raw")
      .select(col("raw"), F.formatPhoneNumbers(col("raw")).as("phones"))
      .collect()
    val grouped = "^(\\d{2}-\\d{3}-\\d{4}|\\d{3}-\\d{3}-\\d{4}|\\d-\\d{3}-\\d{6})$".r
    rows.foreach { r =>
      val entries = r.getString(0).split("\n").map(_.trim).filter(_.nonEmpty)
      val out = r.getSeq[String](1)
      assert(out.length == entries.length, "one output per non-empty entry")
      out.zip(entries).foreach { case (o, in) =>
        assert(grouped.findFirstIn(o).isDefined || o == in,
          s"'$o' is neither a grouping nor the trimmed original '$in'")
      }
    }
  }

  test("binned range join equals the inequality join on random intervals at every bin width") {
    import java.sql.Timestamp
    import graft.operators.RangeJoin
    // random micros across ~3 days, intervals of wildly mixed spans
    // (sub-bin to many-bin, plus empty/inverted) and unaligned starts
    val base = 1700000000000000L
    val micros: Gen[Long] = Gen.choose(0L, 3L * 24 * 3600 * 1000000).map(base + _)
    val spanGens = Seq(
      Gen.choose(-1000000L, 1000000L), // empty-ish/inverted
      Gen.choose(1L, 10L * 60 * 1000000),
      Gen.choose(1L, 8L * 3600 * 1000000))
    val interval: Gen[(Long, Long)] = for {
      s <- micros
      which <- Gen.choose(0, spanGens.size - 1)
      span <- spanGens(which)
    } yield (s, s + span)

    val points = cases(micros, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, new Timestamp(t / 1000)) }
      .toDF("id", "t")
      .withColumn("t", timestamp_micros(unix_micros($"t")))
    val ivs = cases(interval, 80).zipWithIndex
      .map { case ((s, e), i) =>
        (i.toLong, new Timestamp(s / 1000), new Timestamp(e / 1000)) }
      .toDF("iv", "s", "e")

    for (binWidth <- Seq(60L * 1000000, 1800L * 1000000, 24L * 3600 * 1000000)) {
      val binned = RangeJoin.pointInInterval(points, "t", ivs, "s", "e", binWidth)
        .select($"id", $"iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.join(ivs, $"t" >= $"s" && $"t" < $"e")
        .select($"id", $"iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive,
        s"binWidth=$binWidth: binned-only ${(binned -- naive).take(3)}, " +
          s"naive-only ${(naive -- binned).take(3)}")
    }
  }

  test("native FormatPhoneNumbers equals the HOF composition on random entries") {
    val entry: Gen[String] = Gen.oneOf(
      Gen.chooseNum(100000000L, 999999999L).map(n => "0" + n.toString.drop(1)),
      Gen.chooseNum(1000000L, 9999999L).map(n => s"+972 52 $n"),
      Gen.chooseNum(1000000L, 9999999L).map(n => s"+972 2 $n"),
      Gen.chooseNum(0L, 999999L).map(n => f"1800$n%06d"),
      Gen.const("  \t "),
      asciiText)
    val raws = cases(Gen.listOfN(4, entry).map(_.mkString("\n")), 100)
    val diff = raws.map(Tuple1(_)).toDF("raw")
      .select(
        F.formatPhoneNumbers(col("raw")).as("native"),
        F.formatPhoneNumbersHof(col("raw")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .collect()
    assert(diff.isEmpty, s"first divergence: ${diff.headOption}")
  }

  test("native TextFieldsExtract equals the composed schema recursion on nested docs") {
    val rows = cases(
      for {
        name <- asciiText
        seg <- Gen.option(asciiText)
        urls <- Gen.listOf(asciiText)
        kids <- Gen.listOfN(3, Gen.zip(asciiText, Gen.option(asciiText)))
      } yield (name, seg.orNull, urls, kids.map { case (a, b) => (a, b.orNull) }),
      60)
    val df = rows.toDF("name", "segment", "urls", "kids")
      .select(struct(col("name"), col("urls"), col("segment"), col("kids")).as("doc"))
    val dt = df.schema("doc").dataType
    val diff = df.select(
      graft.operators.EsDocs.textFields(col("doc"), dt, "[A-Za-z]{3,}", Set("urls")).as("native"),
      graft.operators.EsDocs.textFieldsHof(col("doc"), dt, "[A-Za-z]{3,}", Set("urls")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .collect()
    assert(diff.isEmpty, s"first divergence: ${diff.headOption}")
  }

  test("native PolyHash equals the fold on random ASCII strings") {
    val strs = cases(asciiText, 200).distinct
    val got = strs.toDF("s")
      .select(PolyHash(col("s")).as("h"), col("s"))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    strs.foreach { s =>
      assert(got(s) == PolyHash.eval(s, 31L, 1000000007L))
    }
  }

  test("ITM->WGS84->ITM round-trips within a millimetre over Israel's extent") {
    val coord = for {
      e <- Gen.chooseNum(130000.0, 260000.0)
      n <- Gen.chooseNum(400000.0, 770000.0)
    } yield (e, n)
    cases(coord, 300).foreach { case (e, n) =>
      val Array(lon, lat) = GeoMath.itmToWgs84(e, n)
      // undo the datum shift by inverting through the public API:
      // project the WGS84 point back with the forward chain
      val (e2, n2) = GeoMath.wgs84ToItm(lon, lat)
      assert(math.abs(e2 - e) < 1e-3 && math.abs(n2 - n) < 1e-3,
        s"round-trip drifted: ($e,$n) -> ($e2,$n2)")
    }
  }

  test("native Shingles equals the HOF form on random token arrays") {
    val tokens = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    val inputs = cases(tokens, 150)
    for (w <- Seq(1, 3, 8)) {
      val df = inputs.map(Tuple1(_)).toDF("toks")
        .select(
          graft.operators.Dedup.shingles(col("toks"), w).as("native"),
          graft.operators.Dedup.shinglesHof(col("toks"), w).as("hof"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"w=$w: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("native QuantizeInt8Csv equals the HOF composition on random vectors") {
    val vecGen: Gen[List[Float]] = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.chooseNum(-10.0f, 10.0f)),
      Gen.const(List(0.0f, 0.0f, 0.0f)),
      Gen.const(List.empty[Float]),
      Gen.nonEmptyListOf(Gen.chooseNum(-1e-5f, 1e-5f)))
    val inputs = cases(vecGen, 150)
    val maxAbs = array_max(transform(col("v"), x => abs(x.cast("double"))))
    val df = inputs.map(Tuple1(_)).toDF("v")
      .withColumn("scale", lit(127.0) / greatest(maxAbs, lit(1e-30)))
      .select(
        graft.functions.expressions.QuantizeInt8Csv(col("v")).as("native"),
        array_join(transform(col("v"),
          x => round(x.cast("double") * col("scale")).cast("int").cast("string")), ",").as("hof"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), s"${r.getString(0)} vs ${r.getString(1)}")
    }
  }

  test("int8 quantization (q84 kernel) round-trips within half a step") {
    // Symmetric scale 127/max|x|: every code must fit int8 and
    // dequantizing must land within half a quantization step of the
    // input (plus float->double noise). Includes the all-zero vector,
    // which must not divide by zero.
    val vecGen: Gen[List[Float]] = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.chooseNum(-10.0f, 10.0f)),
      Gen.const(List(0.0f, 0.0f, 0.0f)),
      Gen.nonEmptyListOf(Gen.chooseNum(-1e-5f, 1e-5f)))
    val inputs = cases(vecGen, 120)
    val maxAbs = array_max(transform(col("v"), x => abs(x.cast("double"))))
    val df = inputs.map(Tuple1(_)).toDF("v")
      .withColumn("scale", lit(127.0) / greatest(maxAbs, lit(1e-30)))
      .select(col("v"), col("scale"),
        transform(col("v"), x => round(x.cast("double") * col("scale")).cast("int")).as("codes"))
    df.collect().foreach { r =>
      val v = r.getSeq[Float](0); val scale = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      codes.foreach(c => assert(c >= -127 && c <= 127, s"code $c out of int8 range"))
      v.zip(codes).foreach { case (x, c) =>
        if (scale < 1e29) { // skip the degenerate all-zero guard branch
          val err = math.abs(x.toDouble - c / scale)
          assert(err <= 0.5 / scale + 1e-12, s"round-trip err $err > half-step ${0.5 / scale}")
        }
      }
    }
  }

  test("bottom_k_sample equals the sort-based reference on random data") {
    // law: for ANY (hash, id) multiset and any k, the aggregate's output
    // is exactly the first k pairs of the (h, id)-sorted distinct-row
    // stream — including tie groups on h and k > group size
    import graft.functions.expressions.BottomKSample
    val pair: Gen[(Long, Long, Long)] = for {
      g <- Gen.choose(0L, 3L)
      h <- Gen.choose(0L, 20L) // small range forces h-ties
      id <- Gen.choose(0L, 1000L)
    } yield (g, h, id)
    val rows = cases(pair, 600).distinct
    for (k <- Seq(1, 5, 50)) {
      val got = rows.toDF("g", "h", "id").repartition(7)
        .groupBy($"g").agg(BottomKSample($"h", $"id", k).as("smp"))
        .select($"g", posexplode($"smp"))
        .select($"g", $"pos", $"col.h", $"col.id")
        .as[(Long, Int, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toList).toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3)).distinct.sorted.take(k)).toMap
      assert(got.keySet == want.keySet)
      for (g <- want.keySet)
        assert(got(g) == want(g), s"k=$k group $g: ${got(g)} != ${want(g)}")
    }
  }

  test("image grid features are invariant to partitioning and batch order") {
    // law: the codec path is per-row pure — repartitioning the payloads
    // (different batches, different order, different thread interleaving)
    // must produce the identical feature set
    import graft.operators.MediaCodec
    val ids = cases(Gen.choose(0L, 100000L), 40).distinct.toDF("id")
    val media = MediaCodec.renderPng(spark, ids, w = 16, h = 16)
    def feats(parts: Int) =
      MediaCodec.imageGridFeatures(spark, media.repartition(parts), grid = 4)
        .collect().map(f => (f.id, f.cell, f.mean_lum)).toSet
    assert(feats(1) == feats(13))
  }

  test("weighted bottom-k draw over-selects heavy items (ES key law)") {
    // 200 items per group: half weight 100, half weight 1. A k=20
    // Efraimidis-Spirakis draw should be dominated by heavy items
    // (expected heavy share ~= 99%); uniform q103-style draws sit at 50%.
    import graft.operators.{Sampling, TopK}
    val df = spark.range(0, 400).select(
      (col("id") % 2).as("g"), col("id"),
      when(col("id") % 4 < 2, 100L).otherwise(1L).as("w"))
    val u = (Sampling.saltedHash32(col("id"), "ws").cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val scored = df.select(col("g"), col("id"), col("w"),
      (log(u) / col("w")).as("key"))
    val sample = TopK.topKPerKey(scored.toDF(), Seq(col("g")),
      Seq(col("key").desc, col("id")), k = 20)
    val heavy = sample.filter(col("w") === 100L).count().toDouble
    assert(heavy / 40.0 > 0.8, s"heavy share ${heavy / 40.0} should dominate")
  }

  test("nfkc_fold is idempotent and length/whitespace-stable on ASCII") {
    import graft.functions.expressions.NfkcFold
    // unicode-rich generator: ascii plus the compatibility classes the
    // fold acts on (fullwidth, ligatures, NBSP, combining marks, Hebrew)
    val uchar: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('Ａ', 'ｆ', 'ﬁ', 'ﬃ', '①', '½', ' ', '　'),
      1 -> Gen.oneOf('é', '́', 'ß', 'א', 'ש'))
    val inputs = cases(Gen.listOf(uchar).map(_.mkString), 300)
    val df = inputs.map(Tuple1(_)).toDF("t")
      .select(col("t"), NfkcFold(col("t")).as("once"))
      .select(col("t"), col("once"), NfkcFold(col("once")).as("twice"))
    df.collect().foreach { r =>
      val raw = r.getString(0); val once = r.getString(1); val twice = r.getString(2)
      assert(once == twice, s"not idempotent on ${raw.map(_.toInt)}: $once vs $twice")
      assert(!once.exists(_.isUpper), s"uppercase survived: $once")
    }
    // pure-ASCII inputs only fold case — length and token structure hold
    val ascii = cases(asciiText, 100)
    ascii.map(Tuple1(_)).toDF("t")
      .select(col("t"), NfkcFold(col("t")).as("f")).collect().foreach { r =>
      assert(r.getString(1) == r.getString(0).toLowerCase(java.util.Locale.ROOT))
    }
  }

  test("HtmlTable.extract round-trips ANY generated table: cells out == cells in") {
    // cell-safe text: no tag metacharacters (a crawl cleaner's job, not
    // the table parser's), no leading/trailing whitespace ambiguity
    val cellText: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('.'), 1 -> Gen.const('-'),
      1 -> Gen.const(':'))).map(_.mkString)
    val header: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    case class Tbl(hdr: List[String], rows: List[List[String]],
                   thHeader: Boolean, attrs: Boolean, decoy: Boolean)
    val tbl: Gen[Tbl] = for {
      ncols <- Gen.choose(1, 4)
      hdr <- Gen.listOfN(ncols, header)
      nrows <- Gen.choose(0, 3)
      rows <- Gen.listOfN(nrows, Gen.listOfN(ncols, cellText))
      th <- Gen.oneOf(true, false)
      attrs <- Gen.oneOf(true, false)
      decoy <- Gen.oneOf(true, false)
    } yield Tbl(hdr, rows, th, attrs, decoy)
    // one crafted instance pins the arms the seeded sample may miss:
    // an EMPTY cell value and a single-column header-only neighbor
    val tables = cases(tbl, 40) :+
      Tbl(List("h1", "h2"), List(List("", "v")), thHeader = false,
        attrs = true, decoy = true)
    def render(t: Tbl): String = {
      val (ho, hc) = if (t.thHeader) ("<th>", "</th>") else ("<td>", "</td>")
      val trOpen = if (t.attrs) "<tr class=\"x\">" else "<tr>"
      val tdOpen = if (t.attrs) "<td data-v=\"1\">" else "<td>"
      "<html><p>junk</p><table id=\"g\">" +
        t.hdr.map(h => ho + h + hc).mkString("<tr>", "", "</tr>") +
        t.rows.map(r => r.map(c => tdOpen + c + "</td>").mkString(trOpen, "", "</tr>")).mkString +
        "</table>" +
        (if (t.decoy) "<table><tr><td>zz</td></tr></table>" else "") +
        "</html>"
    }
    val docs = tables.zipWithIndex.map { case (t, i) => (i.toLong, render(t)) }
      .toDF("doc_id", "html")
    val got = graft.operators.HtmlTable.extract(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    val want = tables.zipWithIndex.flatMap { case (t, i) =>
      t.rows.zipWithIndex.flatMap { case (row, rn) =>
        row.zipWithIndex.map { case (v, cn) =>
          (i.toLong, (rn + 1).toLong, (cn + 1).toLong, t.hdr(cn), v)
        }
      }
    }.toSet
    assert(got == want,
      s"parser-only: ${(got -- want).take(3)}, gen-only: ${(want -- got).take(3)}")
    // the fused one-pass expression ≡ the composed regex chain on the
    // same arbitrary tables (extract routes through HtmlTableParse; the
    // composed form is the retained measurement reference)
    val composed = graft.operators.HtmlTable.extractComposed(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    assert(composed == got,
      s"fused-only: ${(got -- composed).take(3)}, composed-only: ${(composed -- got).take(3)}")
    // the generators actually exercised the quirk arms
    assert(tables.exists(_.rows.isEmpty) && tables.exists(_.attrs) &&
      tables.exists(_.thHeader) && tables.exists(!_.thHeader) &&
      tables.exists(_.rows.exists(_.contains(""))),
      "generator coverage collapsed — widen the case count")
  }

  test("StatusSync.reconcile matches an independent Scala replay on random tables") {
    val statusGen: Gen[Option[String]] = Gen.frequency(
      4 -> Gen.const(Some("ACTIVE")), 3 -> Gen.const(Some("INACTIVE")),
      1 -> Gen.const(Some("PENDING")), 2 -> Gen.const(None))
    case class Case(stored: List[(Int, Option[String])], staged: List[Int])
    val caseGen: Gen[Case] = for {
      n <- Gen.choose(0, 25)
      stored <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 7), statusGen))
      staged <- Gen.listOf(Gen.choose(0, 7))
    } yield Case(stored, staged)
    // crafted instance: a PENDING survivor, a null-status survivor, and
    // a last-wins flip to INACTIVE — arms a seeded sample may miss
    val instances = cases(caseGen, 12) :+
      Case(List((0, Some("PENDING")), (1, Some("ACTIVE")),
        (1, Some("INACTIVE")), (2, None)), List(3))
    // one Spark pass over every instance: keys prefixed per case so the
    // per-key semantics cannot leak across cases
    def pk(i: Int, key: Int) = s"c${i}_k$key"
    val stored = instances.zipWithIndex.flatMap { case (c, i) =>
      c.stored.zipWithIndex.map { case ((key, st), ord) =>
        (pk(i, key), st, ord.toLong)
      }
    }.toDF("key", "status", "ord")
    val staged = instances.zipWithIndex
      .flatMap { case (c, i) => c.staged.map(k => pk(i, k)) }.toDF("key")
    val got = graft.operators.StatusSync.reconcile(stored, staged).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    val want = instances.zipWithIndex.flatMap { case (c, i) =>
      val stagedSet = c.staged.map(pk(i, _)).toSet
      c.stored.zipWithIndex.groupBy { case ((key, _), _) => pk(i, key) }
        .map { case (key, rows) => key -> rows.maxBy(_._2)._1._2 } // last-wins
        .collect { case (key, st)
          if !stagedSet.contains(key) && st != Some("INACTIVE") => (key, st) }
    }.toSet
    assert(got == want,
      s"op-only: ${(got -- want).take(3)}, replay-only: ${(want -- got).take(3)}")
    assert(want.exists(_._2.isEmpty) && want.exists(_._2.contains("PENDING")),
      "generator coverage collapsed — null and non-standard statuses must appear")
  }
}
