package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.functions.F

/** BPE induction loop (q129 / operators.Bpe). */
class BpeSpec extends SpecBase {
  import spark.implicits._

  /** Single-threaded reference BPE over a word-frequency map. */
  private def referenceBpe(words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, n) => (w.map(_.toString): Seq[String], n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
        out += ((r, a, b, n))
        vocab = vocab.map { case (syms, cnt) => (Bpe.mergePair(syms, a, b), cnt) }
        r += 1
      }
    }
    out.toSeq
  }

  test("mergePair is greedy left-to-right non-overlapping") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.mergePair(Seq("a", "b", "b"), "b", "b") == Seq("a", "bb"))
  }

  test("distributed induction equals the single-threaded reference on the corpus") {
    val words = Tables.documents(spark, SfDir)
      .select(explode(F.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("f"))
    val got = Bpe.learnMerges(spark, words, rounds = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val ref = referenceBpe(
      words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, rounds = 6)
    assert(got.nonEmpty)
    assert(got == ref, s"got=${got.take(3)} ref=${ref.take(3)}")
  }

  test("winner counts never increase across rounds; merges are distinct pairs") {
    val words = Seq(("abcabc", 50L), ("abcd", 30L), ("bcd", 20L)).toDF("tok", "f")
    val merges = Bpe.learnMerges(spark, words, rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.nonEmpty)
    val ns = merges.sortBy(_._1).map(_._4)
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b }, ns.mkString(","))
    val pairs = merges.map(m => (m._2, m._3))
    assert(pairs.distinct.length == pairs.length)
  }

  test("early stop: no pair reaches minCount") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("tok", "f")
    assert(Bpe.learnMerges(spark, words, rounds = 5, minCount = 3).count() == 0)
  }

  /** Independent HF-style encoder: repeatedly merge the LOWEST-RANK pair
    * present anywhere in the word (leftmost occurrence), one occurrence
    * at a time, until no pair is in the table. */
  private def priorityEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms: Vector[String] = word.map(_.toString).toVector
    var continue = true
    while (continue && syms.length > 1) {
      val candidates = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (candidates.isEmpty) continue = false
      else {
        val (_, i) = candidates.min // lowest rank, then leftmost
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("q145: rank-order fold equals the priority encoder on real corpus words") {
    val words = Tables.documents(spark, SfDir)
      .select(explode(F.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("f"))
    val merges = Bpe.learnMerges(spark, words, rounds = 6)
      .orderBy($"round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val toks = words.select($"tok").as[String].collect()
    for (t <- toks) {
      val fold = Bpe.encodeWord(t, merges)
      assert(fold == priorityEncode(t, merges), s"word '$t': $fold vs priority")
      assert(fold.mkString == t, s"concatenation invariant broken for '$t'")
    }
  }

  test("q145 output conserves corpus character counts") {
    val out = SparkEntry.queries("q145_bpe_encode")(spark, SfDir)
    val subwordChars = out
      .select(sum(length($"subword") * $"corpus_freq")).as[Long].head()
    val corpusChars = Tables.documents(spark, SfDir)
      .select(explode(F.tokens($"text")).as("tok"))
      .select(sum(length($"tok"))).as[Long].head()
    assert(subwordChars == corpusChars, s"$subwordChars != $corpusChars")
  }
}
