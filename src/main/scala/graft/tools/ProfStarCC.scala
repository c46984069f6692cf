package graft.tools
import org.apache.spark.sql.functions._
import graft._
/** One-off experiment: does CC over star links reproduce CC over all-pairs
  * links (same LSH buckets, same verify threshold)? Prints the partition
  * diff at two thresholds on sf0.01.
  */
object ProfStarCC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Tables.documents(spark, dir)
    val ids = docs.select(col("doc_id").as("id"))
    for (th <- Seq(0.7, 0.9)) {
      val star = operators.Dedup.minhashDedupLinks(docs, "doc_id", "text", threshold = th)
        .select(col("id_a"), col("id_b"))
      val all = operators.Dedup.minhashNearDups(docs, "doc_id", "text", threshold = th)
        .select(col("id_a"), col("id_b"))
      val ccStar = operators.Dedup.connectedComponents(ids, star)
        .withColumnRenamed("label", "l_star")
      val ccAll = operators.Dedup.connectedComponents(ids, all)
        .withColumnRenamed("label", "l_all")
      val j = ccStar.join(ccAll, "id").cache()
      val nStar = j.select(col("l_star")).distinct().count()
      val nAll = j.select(col("l_all")).distinct().count()
      // partitions are equal iff the (l_star, l_all) pairing is a bijection
      val pairing = j.select(col("l_star"), col("l_all")).distinct().count()
      println(s"RESULT th=$th  clusters star=$nStar all=$nAll pairing=$pairing  " +
        s"equal=${nStar == nAll && nAll == pairing}")
      j.unpersist()
    }
    spark.stop()
  }
}
