package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.functions.expressions.NfkcFold

/** nfkc_fold realization cost at sf0.1: the native codegen'd Expression
  * (one static call inside whole-stage codegen) vs a Scala UDF doing the
  * IDENTICAL fold — the "functions, not UDFs" gap isolated on a kernel
  * whose inner work (Normalizer) is the same in both, so the measured
  * delta is pure UDF overhead: SerDe to/from the Row encoder, the
  * null-boxing wrapper, and the codegen fence the UDF puts through the
  * projection.
  */
object ProfNfkc {
  private def time(label: String)(df: => DataFrame): Long = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"RESULT $label ms=$ms")
    ms
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val udfFold = udf((s: String) => if (s == null) null else NfkcFold.fold(s))

    def native = docs.select(col("doc_id"), md5(NfkcFold(col("text"))).as("k"))
    def viaUdf = docs.select(col("doc_id"), md5(udfFold(col("text"))).as("k"))

    // warm both paths (codegen + JIT), then alternate measurements
    time("warm_native")(native); time("warm_udf")(viaUdf)
    for (i <- 1 to 3) {
      time(s"native_$i")(native)
      time(s"udf_$i")(viaUdf)
    }
  }
}
