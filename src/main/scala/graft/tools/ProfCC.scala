package graft.tools
import org.apache.spark.sql.functions._
import graft._
object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val pairs = operators.Dedup.jaccardPairs(docs, "doc_id", "lang", "text", 0.9)
      .select(col("id_a"), col("id_b"))
    t("pairs materialize")(println("pairs=" + pairs.cache().count()))
    t("cc over cached pairs") {
      val labels = operators.Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
      println("clusters=" + labels.select(col("label")).distinct().count())
    }
    t("cc again (warm)") {
      operators.Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs).count()
    }
    spark.stop()
  }
}
