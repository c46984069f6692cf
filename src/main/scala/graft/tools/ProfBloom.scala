package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Bloom

/** Bloom-filter semi-join pruning, measured (feeds the q125 claim): a
  * probe stream against a filter side that is NOT broadcastable. Compares:
  *   - shuffle_exact:   plain shuffle-hash semi join — every probe row
  *     shuffles whether or not it can match (the baseline q125 replaces)
  *   - bloom_pruned:    Bloom build + scan-side might_contain prune +
  *     exact shuffle-hash join on the survivors (q125's composition;
  *     the bloom build pass is INCLUDED in its time)
  *   - broadcast_exact: broadcast hash join — the q75 plan, correct
  *     until the filter side outgrows executor memory; measured as the
  *     reference point the other two are honest alternatives to
  *
  * The interesting regime is low match rate (decontamination: almost all
  * of the corpus is clean): the bloom discards ~99% of probe rows before
  * the exchange, so the shuffle carries survivors instead of the corpus.
  */
object ProfBloom {
  /** Accumulates executor shuffle-write bytes across stages — the WIRE
    * VOLUME the pruning exists to cut. Time alone is a poor judge here:
    * a local[] shuffle runs at page-cache speed, while on a cluster the
    * same bytes cross a network. */
  private object ShuffleBytes extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def time(spark: org.apache.spark.sql.SparkSession, label: String)(df: => DataFrame): Long = {
    ShuffleBytes.bytes.set(0)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val ms = (System.nanoTime() - t0) / 1000000
    // listener events are async; a short settle keeps stage metrics whole
    Thread.sleep(300)
    val mb = ShuffleBytes.bytes.get() / 1048576
    println(s"RESULT $label ms=$ms shuffle_mb=$mb")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val nProbe = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nFilter = 2000000L // 2M keys: plausibly past the broadcast comfort zone
    val matchRate = 100L   // 1% of probe rows hit the filter set

    // filter side: string keys f<0..nFilter) — a benchmark-shingle stand-in
    val filterSide = spark.range(nFilter)
      .select(concat(lit("f"), col("id")).as("k")).cache()
    // probe side: 1% lands in the filter key space, 99% in a disjoint
    // one. Rows carry a ~160-byte incompressible payload — the realistic
    // decontamination shape (rows are shingles/doc slices, not bare
    // keys), and exactly what makes shuffle volume the cost that pruning
    // attacks.
    val probe = spark.range(nProbe).select(
      when(col("id") % matchRate === 0,
        concat(lit("f"), pmod(hash(col("id")), lit(nFilter))))
        .otherwise(concat(lit("x"), col("id"))).as("k"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")),
        md5((col("id") + 2).cast("string")),
        md5((col("id") + 3).cast("string")),
        md5((col("id") + 4).cast("string"))).as("payload")).cache()
    filterSide.count(); probe.count()

    def shuffleExact = probe.join(filterSide.hint("shuffle_hash"), "k")
    def broadcastExact = probe.join(broadcast(filterSide), "k")
    def bloomPruned = {
      val bf = Bloom.build(filterSide, col("k"), expectedItems = nFilter)
      probe.filter(Bloom.mightContain(bf, col("k")))
        .join(filterSide.hint("shuffle_hash"), "k")
    }

    spark.sparkContext.addSparkListener(ShuffleBytes)
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      time(spark, "shuffle_exact")(shuffleExact)
      time(spark, "bloom_pruned")(bloomPruned)
      time(spark, "broadcast_exact")(broadcastExact)
    }
    spark.stop()
  }
}
