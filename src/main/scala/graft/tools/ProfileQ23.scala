package graft.tools
import org.apache.spark.sql.functions._
import graft._
import graft.operators.Dedup
object ProfileQ23 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"PROFILE $name: ${(System.nanoTime()-t0)/1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    docs.count()
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
    time("signatures")(sigs.count())
    time("signatures2")(sigs.count())
    val banded = sigs.select(col("id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("band"))
      .select(col("id"), col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    time("banded")(banded.count())
    val links = Dedup.minhashDedupLinks(docs, "doc_id", "text")
    time("full_links")(links.count())
    println("links rows: " + links.count())
    spark.stop()
  }
}
