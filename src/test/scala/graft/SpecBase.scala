package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; sf0.001 is the smoke-scale data. */
abstract class SpecBase extends AnyFunSuite with BeforeAndAfterAll {
  val SfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SpecBase.sharedSpark

  override def afterAll(): Unit = () // session shared across suites
}

object SpecBase {
  lazy val sharedSpark: SparkSession =
    GraftSession.builder(Some("local[4]"), shufflePartitions = 4).getOrCreate()
}
