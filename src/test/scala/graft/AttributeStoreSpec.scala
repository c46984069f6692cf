package graft

import org.apache.spark.sql.functions._

import graft.sources.AttributeStore

/** The decoupled tagger/filter architecture: tag once into slim bucketed
  * attribute tables, compose any filter policy as a zero-shuffle
  * co-located join chain, and re-policy without re-tagging.
  */
class AttributeStoreSpec extends SpecBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, SfDir)

  private lazy val stored: Unit = {
    graft.sources.Sources.dumpToTable(
      Tables.documents(spark, SfDir).select(col("doc_id"), col("text"), col("lang")),
      "as_corpus", indexFields = Seq("doc_id"), nBuckets = 8)
    AttributeStore.writeAttributeTable(
      q("q28_langid").select(col("doc_id"), col("en_ratio")),
      "as_lang", nBuckets = 8)
    AttributeStore.writeAttributeTable(
      q("q164_classifier_filter").select(col("doc_id"), col("margin_1e6"), col("kept")),
      "as_clf", nBuckets = 8)
    AttributeStore.writeAttributeTable(
      q("q165_gopher_rules").select(col("doc_id"), col("r_stop"), col("passes")),
      "as_gopher", nBuckets = 8)
  }

  test("a filter policy composes as a zero-shuffle co-located join over slim attributes") {
    stored
    val composed = AttributeStore.compose(spark, "as_corpus",
      Seq("as_lang", "as_clf", "as_gopher"))
    val policy = composed
      .filter(col("kept") && col("en_ratio") > 0.02)
      .select(col("doc_id"), col("text"))
    val plan = policy.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) == 3,
      s"three attribute joins must all sort-merge:\n${plan.take(800)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"identically-bucketed tables must compose with ZERO shuffles:\n${plan.take(800)}")
    // attribute scans never read text — the whole point of slim tables
    val attrScans = plan.linesIterator.filter(l =>
      l.contains("FileScan") && (l.contains("as_lang") || l.contains("as_clf") ||
        l.contains("as_gopher")))
    assert(attrScans.forall(!_.contains("text")), "attribute scans must not read text")
    // policy output ≡ computing every tagger inline over the raw corpus
    val inline = Tables.documents(spark, SfDir)
      .join(q("q28_langid"), "doc_id")
      .join(q("q164_classifier_filter").withColumnRenamed("n_tokens", "nt2"), "doc_id")
      .join(q("q165_gopher_rules"), "doc_id")
      .filter(col("kept") && col("en_ratio") > 0.02)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // non-trivial on this fixture (kept ~498/500, en_ratio>0.02 ~461):
    // an empty==empty pass would prove nothing
    assert(inline.nonEmpty, "fixture must keep a non-empty policy set")
    assert(policy.select(col("doc_id")).collect().map(_.getLong(0)).toSet == inline,
      "the composed policy must keep exactly the inline-computed set")
  }

  test("q166's passage attributes compose with a gopher policy: re-threshold, zero corpus re-read") {
    stored
    // the ExactSubstr pass runs ONCE; its per-doc contamination numbers
    // land as a slim bucketed attribute table beside the other taggers
    AttributeStore.writeAttributeTable(
      q("q166_passage_dedup").select(col("doc_id"),
        col("dup_windows"), col("dup_frac_1e4")),
      "as_passage", nBuckets = 8)
    val composed = AttributeStore.compose(spark, "as_corpus",
      Seq("as_gopher", "as_passage"))
    val policy = composed
      .filter(col("dup_frac_1e4") < 5000)
      .select(col("doc_id"))
    val plan = policy.queryExecution.executedPlan.toString
    // a threshold change re-reads ONLY the store: no window hashing
    // (md5), no text column, no exchange
    assert(!plan.contains("md5"), "re-policy must not re-run the passage marking")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed policy must compose with zero shuffles:\n${plan.take(800)}")
    val inline = q("q166_passage_dedup")
      .select(col("doc_id"), col("dup_frac_1e4"))
      .filter(col("dup_frac_1e4") < 5000)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inline.nonEmpty, "fixture must keep a non-empty policy set")
    assert(policy.collect().map(_.getLong(0)).toSet == inline,
      "the attribute policy must keep exactly the inline-computed set")
    // a stricter duplication threshold is a pure re-filter of the store
    val strictIds = composed.filter(col("dup_frac_1e4") === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(strictIds.subsetOf(inline))
  }

  test("combined re-policy (quality × dup × domain blocklist) reads ONLY the store") {
    stored
    // the r11 breadth case: q171's domain keys join the store beside the
    // classifier verdicts and passage-dup numbers, and a three-signal policy —
    // the real corpus-curation gate (quality rules ∧ duplication cap ∧
    // domain blocklist) — composes exchange-free without re-running any
    // tagger: no URL regexes, no window hashing, no text
    AttributeStore.writeAttributeTable(
      q("q166_passage_dedup").select(col("doc_id"),
        col("dup_windows"), col("dup_frac_1e4")),
      "as_passage", nBuckets = 8)
    val d = col("doc_id")
    val url = concat(lit("HTTPS://WWW.Site-"), (d % 37).cast("string"), lit(".COM"),
      lit("/Dir/Page-"), (d % 7).cast("string"))
    AttributeStore.writeAttributeTable(
      Tables.documents(spark, SfDir)
        .select(d, graft.operators.Urls.urlDomain(url).as("domain")),
      "as_domain", nBuckets = 8)
    val blocked = Seq("site-0.com", "site-7.com", "site-13.com")
    val composed = AttributeStore.compose(spark, "as_corpus",
      Seq("as_clf", "as_passage", "as_domain"))
    val policy = composed
      .filter(col("kept") && col("dup_frac_1e4") < 5000 && !col("domain").isin(blocked: _*))
      .select(col("doc_id"))
    val plan = policy.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"tri-signal policy must compose with zero shuffles:\n${plan.take(800)}")
    assert(!plan.contains("regexp") && !plan.contains("md5"),
      "re-policy must not re-run canonicalization or passage marking")
    val inline = q("q166_passage_dedup").select(col("doc_id"), col("dup_frac_1e4"))
      .join(q("q164_classifier_filter").select(col("doc_id"), col("kept")), "doc_id")
      .join(Tables.documents(spark, SfDir)
        .select(d, graft.operators.Urls.urlDomain(url).as("domain")), "doc_id")
      .filter(col("kept") && col("dup_frac_1e4") < 5000 && !col("domain").isin(blocked: _*))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(policy.collect().map(_.getLong(0)).toSet == inline,
      "the tri-signal attribute policy must keep exactly the inline-computed set")
    // flipping the blocklist is a pure store re-filter with disjoint complement
    val flipped = composed
      .filter(col("kept") && col("dup_frac_1e4") < 5000 && col("domain").isin(blocked: _*))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inline.nonEmpty && flipped.nonEmpty, "fixture must exercise both sides of the blocklist")
    assert(flipped.intersect(inline).isEmpty)
  }

  test("compose left-joins (coverage gaps visible as nulls); assertCoverage fails loud") {
    stored
    AttributeStore.writeAttributeTable(
      q("q28_langid").filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("en_ratio")),
      "as_partial", nBuckets = 8)
    val composed = AttributeStore.compose(spark, "as_corpus", Seq("as_partial"))
    val n = spark.table("as_corpus").count()
    assert(composed.count() == n,
      "left compose must keep every corpus row — a gap must not shrink the corpus silently")
    assert(composed.filter(col("en_ratio").isNull).count() > 0,
      "the coverage gap must surface as NULL attributes")
    intercept[IllegalArgumentException] {
      AttributeStore.compose(spark, "as_corpus", Seq("as_partial"),
        assertCoverage = true)
    }
    // the explicit inner opt-out (r10 ADVICE): policies relying on
    // uncovered-doc EXCLUSION (negated predicates over nullable attrs)
    // get the pre-r10 semantics back without hand-writing null gates
    val inner = AttributeStore.compose(spark, "as_corpus", Seq("as_partial"),
      joinType = "inner")
    assert(inner.count() < n && inner.filter(col("en_ratio").isNull).count() == 0,
      "inner mode must drop uncovered docs")
  }

  test("re-policying reuses the stored attributes: different filter, no re-tagging, same store") {
    stored
    val composed = AttributeStore.compose(spark, "as_corpus", Seq("as_clf", "as_gopher"))
    val strict = composed.filter(col("passes") && col("margin_1e6") > 0)
    val loose = composed.filter(col("kept"))
    val nStrict = strict.count()
    val nLoose = loose.count()
    assert(nStrict <= nLoose, "the strict policy cannot keep more than the loose one")
    // strict ⊆ loose here because passes ∧ margin>0 implies kept (= margin>0)
    val strictIds = strict.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val looseIds = loose.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(strictIds.subsetOf(looseIds))
  }
}
