package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, TextAnalysis, TopK}
import graft.functions.F

/** Saved BM25 index lifecycle: probe ≡ the corpus-priced q167 form
  * row-for-row, the posting scan prunes to the query terms' buckets,
  * append-as-delta ≡ rebuild, replay idempotence, compaction fold. */
class RetrievalSpec extends SpecBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").resolve("idx").toString

  private lazy val docs = Tables.documents(spark, SfDir)
    .select(col("doc_id"), col("lang"), col("text")).cache()

  /** q167's deterministic workload: per-language top-3 corpus tokens. */
  private lazy val qt: DataFrame = {
    val freq = docs
      .select(col("lang"), explode(F.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
    TopK.topKWithRank(freq, col("lang"), Seq(col("c").desc, col("tok")), 3, "rn")
      .select(col("lang").as("query_id"), col("tok"))
      .localCheckpoint(true)
  }

  private def rows(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("score_1e4"), r.getAs[Long]("n_terms_hit"),
      r.getAs[Long]("rk"))).toSet

  test("bm25TopKFromSaved equals the corpus-priced bm25TopK row-for-row") {
    val dir = tmp("bm25")
    Retrieval.saveBm25Index(docs, "doc_id", "text", dir, nBuckets = 16)
    val live = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text", qt, topK = 10))
    val saved = rows(Retrieval.bm25TopKFromSaved(spark, dir, qt, topK = 10))
    assert(saved == live)
    assert(saved.nonEmpty)
  }

  test("the saved-index posting scan prunes to the probed buckets") {
    val dir = tmp("bm25prune")
    Retrieval.saveBm25Index(docs, "doc_id", "text", dir, nBuckets = 16)
    // single-term query → exactly one (batch=0, bucket) partition may
    // survive; the files-read metric is the ground truth that pruning
    // actually dropped the other buckets' files, not just planned to
    val oneTerm = qt.limit(1).localCheckpoint(true)
    val probe = Retrieval.bm25TopKFromSaved(spark, dir, oneTerm, topK = 10)
    probe.collect() // finalize the adaptive plan + populate scan metrics
    val plan = probe.queryExecution.executedPlan
    val scans = collectWithSubqueries(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(scans.nonEmpty, "no posting scan found in the probe plan")
    val postingScan = scans.head
    assert(postingScan.partitionFilters.exists(_.toString.contains("bucket")),
      s"posting scan has no bucket partition filter: ${postingScan.partitionFilters}")
    assert(postingScan.partitionFilters.exists(_.toString.contains("batch")),
      s"posting scan has no committed-batch partition filter: ${postingScan.partitionFilters}")
    val filesRead = postingScan.metrics("numFiles").value
    val bucketDirs = new java.io.File(s"$dir/postings/batch=0")
      .listFiles().count(_.getName.startsWith("bucket="))
    assert(bucketDirs > 1, s"weak data: only $bucketDirs bucket dirs on disk")
    assert(filesRead == 1,
      s"expected the probe to read exactly 1 posting file (1 bucket), read $filesRead of $bucketDirs buckets")
  }

  test("append-as-delta equals a single-shot rebuild; replay is idempotent") {
    val half = docs.agg((max(col("doc_id")) / 2).cast("long")).head().getLong(0)
    val first = docs.filter(col("doc_id") <= half)
    val second = docs.filter(col("doc_id") > half)
    val appended = tmp("bm25app")
    Retrieval.saveBm25Index(first, "doc_id", "text", appended, nBuckets = 16)
    Retrieval.appendToBm25Index(spark, appended, second, "doc_id", "text", batchId = 1L)
    val rebuilt = tmp("bm25reb")
    Retrieval.saveBm25Index(docs, "doc_id", "text", rebuilt, nBuckets = 16)
    val a = rows(Retrieval.bm25TopKFromSaved(spark, appended, qt, topK = 10))
    assert(a == rows(Retrieval.bm25TopKFromSaved(spark, rebuilt, qt, topK = 10)))
    // a redelivered batch overwrites its own zones — nothing double-counts
    Retrieval.appendToBm25Index(spark, appended, second, "doc_id", "text", batchId = 1L)
    assert(rows(Retrieval.bm25TopKFromSaved(spark, appended, qt, topK = 10)) == a)
  }

  test("compaction folds committed batches into the sentinel; fresh-dir guard fails loud") {
    val half = docs.agg((max(col("doc_id")) / 2).cast("long")).head().getLong(0)
    val src = tmp("bm25cmp")
    Retrieval.saveBm25Index(docs.filter(col("doc_id") <= half), "doc_id", "text",
      src, nBuckets = 16)
    Retrieval.appendToBm25Index(spark, src,
      docs.filter(col("doc_id") > half), "doc_id", "text", batchId = 1L)
    val before = rows(Retrieval.bm25TopKFromSaved(spark, src, qt, topK = 10))
    val dst = tmp("bm25cmpdst")
    Retrieval.compactBm25Index(spark, src, dst)
    assert(rows(Retrieval.bm25TopKFromSaved(spark, dst, qt, topK = 10)) == before)
    // the compacted artifact still accepts appends (batch ids >= 0 sort
    // beside the -1 sentinel) — the post-swap lifecycle continues
    intercept[IllegalArgumentException] {
      Retrieval.compactBm25Index(spark, src, dst) // dst not fresh
    }
    intercept[IllegalArgumentException] {
      Retrieval.saveBm25Index(docs, "doc_id", "text", dst) // save over artifact
    }
  }

  test("streaming ingest: 3 micro-batches equal the single-shot build; replay idempotent") {
    import graft.streaming.RetrievalStreams
    val dir = tmp("bm25stream")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val b = Seq(
      docs.filter(col("doc_id") * 3 <= maxId),
      docs.filter(col("doc_id") * 3 > maxId && col("doc_id") * 3 <= 2 * maxId),
      docs.filter(col("doc_id") * 3 > 2 * maxId))
    val sink = RetrievalStreams.bm25IngestSink(dir, nBuckets = 16) _
    sink(b(0), 0L); sink(b(1), 1L); sink(b(2), 2L)
    val rebuilt = tmp("bm25streamreb")
    Retrieval.saveBm25Index(docs, "doc_id", "text", rebuilt, nBuckets = 16)
    val want = rows(Retrieval.bm25TopKFromSaved(spark, rebuilt, qt, topK = 10))
    assert(rows(Retrieval.bm25TopKFromSaved(spark, dir, qt, topK = 10)) == want)
    // a redelivered micro-batch overwrites its own zones — nothing doubles
    sink(b(1), 1L)
    assert(rows(Retrieval.bm25TopKFromSaved(spark, dir, qt, topK = 10)) == want)
    // a mixed bucket modulus fails loud instead of silently missing probes
    intercept[IllegalArgumentException] {
      RetrievalStreams.bm25IngestSink(dir, nBuckets = 8)(b(0), 3L)
    }
  }

  test("an uncommitted (crash-orphaned) batch is invisible to probe and compaction") {
    val dir = tmp("bm25orphan")
    Retrieval.saveBm25Index(docs, "doc_id", "text", dir, nBuckets = 16)
    val before = rows(Retrieval.bm25TopKFromSaved(spark, dir, qt, topK = 10))
    // simulate a crash: batch-1 zones land but the commit marker does not
    val orphan = docs.limit(50)
    val t = orphan.select(col("doc_id"), F.tokens(col("text")).as("toks"))
    t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(16L)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings/batch=9")
    t.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size(col("toks"))).cast("long").as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats/batch=9")
    assert(rows(Retrieval.bm25TopKFromSaved(spark, dir, qt, topK = 10)) == before)
    val dst = tmp("bm25orphandst")
    Retrieval.compactBm25Index(spark, dir, dst)
    assert(rows(Retrieval.bm25TopKFromSaved(spark, dst, qt, topK = 10)) == before)
  }
}
