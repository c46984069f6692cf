package graft

import org.apache.spark.sql.functions._

/** Invariants for the corpus-scope operators (q80–q87) that the DuckDB
  * row-compare cannot express: sketch error bounds, distribution shape,
  * and cross-query consistency.
  */
class CorpusSpec extends SpecBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, SfDir)

  test("q163 DSIR: resample excludes the seed corpus, is importance-biased and rerun-stable") {
    val sel = q("q163_dsir").collect()
    assert(sel.length == 100, s"fixed-size resample: got ${sel.length}")
    // the in-domain seed defines the target — it is never re-selected
    val inDom = Tables.documents(spark, SfDir)
      .filter(col("source").isin("src0", "src1", "src2"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(sel.forall(r => !inDom(r.getAs[Long]("doc_id"))),
      "an in-domain seed doc must never appear in the resample")
    // the hash-seeded Gumbel draw makes the resample rerun-stable
    val rerun = q("q163_dsir").collect().map(_.toSeq).toSet
    assert(rerun == sel.map(_.toSeq).toSet,
      "the hash-seeded Gumbel draw must make the resample rerun-stable")
    // the ranking respects the key within the sample: rk is the exact
    // (key desc, doc_id) order — the trim never reorders survivors
    val ordered = sel.sortBy(r => r.getAs[Long]("rk"))
      .map(r => (r.getAs[Long]("key_1e4"), r.getAs[Long]("doc_id")))
    assert(ordered.sliding(2).forall {
      case Array((k1, d1), (k2, d2)) => k1 > k2 || (k1 == k2 && d1 < d2)
      case _ => true
    }, "rank order must follow (key desc, doc_id)")
  }

  test("q164 classifier filter: margin bounded by the weight range, kept == sign") {
    val rows = q("q164_classifier_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("margin_1e6")
      // every per-token weight sits in [-1, 1], so the mean margin does too
      assert(math.abs(m) <= 1000000L, s"margin out of the weight hull: $m")
      assert(r.getAs[Boolean]("kept") == (m > 0))
    }
    // the filter is a pure function of text: identical docs score identically
    val byText = Tables.documents(spark, SfDir).select(col("doc_id"), col("text"))
      .join(q("q164_classifier_filter"), "doc_id")
      .groupBy(col("text")).agg(countDistinct(col("margin_1e6")).as("n"))
    assert(byText.filter(col("n") > 1).count() == 0,
      "same text must always produce the same margin")
  }

  test("q165 Gopher rules: passes is exactly the conjunction; rules are self-consistent") {
    val rows = q("q165_gopher_rules").collect()
    assert(rows.nonEmpty)
    val ruleCols = Seq("r_words", "r_mean_len", "r_symbol", "r_alpha",
      "r_bullet", "r_ellipsis", "r_stop")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("passes") ==
        ruleCols.forall(c => r.getAs[Boolean](c)),
        s"passes must be the AND of the seven rules: $r")
      assert(r.getAs[Boolean]("r_stop") == (r.getAs[Long]("stop_hits") >= 2))
      assert(r.getAs[Boolean]("r_words") ==
        (r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000))
      // single-line synthetic docs: the line rules must be trivially green
      assert(r.getAs[Boolean]("r_bullet") && r.getAs[Boolean]("r_ellipsis"))
    }
    // the bundle must DISCRIMINATE on this corpus (not all-pass/all-fail)
    val n = rows.count(_.getAs[Boolean]("passes"))
    assert(n < rows.length, "some docs must fail the bundle on the synthetic corpus")
  }

  test("q94 holdout split: content duplicates share a split; assignment ignores doc_id") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, SfDir)
    // clone every doc under a fresh doc_id: same content MUST mean same
    // split, or held-out text leaks into training through its copies
    val withDupes = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val split = withDupes.select(
      md5(trim(regexp_replace(col("text"), "\\s+", " "))).as("h"),
      Sampling.holdoutSplit(
        md5(trim(regexp_replace(col("text"), "\\s+", " "))), 10, 10).as("split"))
    val crossSplit = split.groupBy($"h").agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count()
    assert(crossSplit == 0, s"$crossSplit content hashes straddle splits")
    val labels = split.select($"split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")), s"bad labels: $labels")
    // 98/1/1 buckets: train must dominate even on the smoke corpus
    val frac = split.filter($"split" === "train").count().toDouble / split.count()
    assert(frac > 0.9, s"train fraction $frac")
  }

  test("q86 HLL cardinality is within 5% of the exact distinct count per language") {
    val approx = q("q86_cardinality_hll")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.documents(spark, SfDir)
      .select($"lang", md5(trim(regexp_replace($"text", "\\s+", " "))).as("h"))
      .groupBy($"lang")
      .agg(countDistinct($"h").as("uniq"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (uniq, docs)) =>
      val (aDocs, aUniq) = approx(lang)
      assert(aDocs == docs, s"$lang exact doc count must ride the same pass")
      val err = math.abs(aUniq.toDouble - uniq) / uniq
      assert(err <= 0.05, s"$lang HLL err $err (approx $aUniq vs exact $uniq)")
    }
  }

  test("q82 shard assignment is balanced and positions are dense per shard") {
    val rows = q("q82_shard_assign").collect()
    val byShard = rows.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 16L).toSet))
    // positions 1..n dense within each shard (a gap would corrupt reader
    // offsets); balance within 3x of the mean (md5 is uniform)
    byShard.foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.head == 1L && pos.last == pos.length,
        s"shard $shard positions not dense: ${pos.take(3).mkString(",")}..${pos.last}")
    }
    val sizes = byShard.values.map(_.length)
    val mean = sizes.sum.toDouble / sizes.size
    assert(sizes.max <= mean * 3, s"skewed shards: max ${sizes.max} vs mean $mean")
  }

  test("q81 incremental keep set equals a fresh exact dedup of the incoming batch minus the corpus") {
    val out = q("q81_incremental_dedup").collect()
    // every kept doc is neither a corpus dup nor a within-batch later copy
    out.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(2) == 0L, s"kept doc ${r.getLong(0)} is a corpus dup")
    }
    // each within-batch hash group keeps at most one doc, and exactly one
    // when the hash is absent from the corpus
    out.groupBy(_.getString(1)).foreach { case (h, rs) =>
      val kept = rs.count(_.getLong(3) == 1L)
      val corpusDup = rs.head.getLong(2) == 1L
      assert(kept == (if (corpusDup) 0 else 1), s"hash $h kept $kept (corpusDup=$corpusDup)")
    }
  }

  test("q121 approx percentiles agree with exact q74 in the degenerate-exact regime") {
    // accuracy 10000 > any per-language group size here, so the GK sketch
    // holds every value and answers the exact nearest-rank quantile; the
    // continuous-interpolated q74 value brackets it within one data gap
    val approx = q("q121_length_stats_approx")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val exact = q("q74_length_stats")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(approx.keySet == exact.keySet)
    val byLang = Tables.documents(spark, SfDir)
      .select($"lang", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (lang, (docs, chars, p50, p90, p99)) =>
      val (eDocs, eChars, e50, e90, e99) = exact(lang)
      assert(docs == eDocs && chars == eChars)
      assert(p50 <= p90 && p90 <= p99)
      val vs = byLang(lang)
      assert(p50 >= vs.head && p99 <= vs.last)
      // nearest-rank vs continuous interpolation: within one neighbor gap
      def gapOk(a: Long, e: Double) = {
        // neighbors by VALUE (duplicates collapse): e interpolates between
        // a and one of its adjacent distinct data values
        val lo = vs.filter(_ < a).lastOption.getOrElse(a)
        val hi = vs.find(_ > a).getOrElse(a)
        e >= lo - 1e-9 && e <= hi + 1e-9
      }
      assert(gapOk(p50, e50) && gapOk(p90, e90) && gapOk(p99, e99),
        s"$lang approx ($p50,$p90,$p99) vs exact ($e50,$e90,$e99)")
    }
  }

  test("q80 logprob totals are finite and n_tokens matches an independent token count") {
    val lp = q("q80_unigram_logprob")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val counts = Tables.documents(spark, SfDir)
      .select($"doc_id", size(graft.functions.F.tokens($"text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp.keySet == counts.keySet)
    lp.foreach { case (id, (n, sum)) =>
      assert(n == counts(id), s"doc $id token count $n vs ${counts(id)}")
      assert(sum < 0, s"doc $id logprob sum must be negative, got $sum")
    }
  }

  test("q136 DAU/WAU sketch estimates track the exact distinct counts within 5%") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q136_active_users")(spark, SfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    // exact twin = registered q178 (itself DuckDB-oracled), so this pin
    // chains the sketch to a triple-matched reference instead of a
    // hand-rolled driver recompute.
    // Both sides share the same window convention: a user active on day
    // X contributes to days X..X+6, so WAU(d) counts users active in
    // [d-6, d] — the trailing 7-day window — in q136 and q178 alike.
    val exact = SparkEntry.queries("q178_active_users_exact")(spark, SfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (d, (dau, wau)) =>
      assert(wau >= dau, s"day $d: wau $wau < dau $dau")
      val (eDau, eWau) = exact(d)
      assert(math.abs(dau - eDau) <= math.max(1, eDau / 20),
        s"day $d dau_est=$dau exact=$eDau")
      assert(math.abs(wau - eWau) <= math.max(1, eWau / 20),
        s"day $d wau_est=$wau exact=$eWau")
    }
  }
}
