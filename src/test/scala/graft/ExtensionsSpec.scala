package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers poly_hash for SQL users") {
    // getOrCreate would silently reuse another suite's session (without
    // our extensions) — detach the default first and restore it after.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // "ab" -> 97*31 + 98 = 3105
      val r = spark.sql("SELECT poly_hash('ab') AS h, poly_hash('ab', 31, 1000000007) AS h3").head()
      assert(r.getLong(0) == 3105L)
      assert(r.getLong(1) == 3105L)
    } finally {
      // Don't stop(): the SparkContext is JVM-global and shared with the
      // other suites' session; just restore the session handles.
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
