package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators.{Dedup, Similarity}

/** Phase breakdown of the semDedup/CC chain on the bench data — sizes the
  * driver-serialization cost of the BSP loop (rounds, checkpoints) vs the
  * pair-discovery compute. */
object ProfSem {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators", org.apache.logging.log4j.Level.INFO)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    // warmup whole q161 once
    t("q161 warmup")(SparkEntry.queries("q161_semdedup")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val assigned = Tables.embeddings(spark, dir).select(
      col("vec_id").as("id"), col("label").cast("long").as("cluster"), col("embedding"))
    // phase 1: pair discovery alone
    val base = assigned.select(col("id"), col("cluster"), col("embedding"))
    val a = base.select(col("cluster"), col("id").as("id_a"), col("embedding").as("ea"))
    val b = base.select(col("cluster").as("cb"), col("id").as("id_b"), col("embedding").as("eb"))
    val pairs = a.join(b, col("cluster") === col("cb") && col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.F.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"))
    t("pairs count")(println("pairs=" + pairs.count()))
    val cached = pairs.cache(); cached.count()
    Seq(4, 2, 1).foreach { cad =>
      (1 to 2).foreach { i =>
        t(s"cc cadence=$cad #$i") {
          Dedup.connectedComponents(assigned.select(col("id")), cached, jumpEvery = cad)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    (1 to 2).foreach { i =>
      t(s"full semDedup #$i") {
        Similarity.semDedup(assigned, 0.3).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
