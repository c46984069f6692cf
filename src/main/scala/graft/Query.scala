package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: the Spark plan plus (when SQL-expressible) a DuckDB
  * oracle over the same parquet tables. Column names/aliases must match
  * between the two — the correctness gate sorts columns by name and
  * hash-compares values.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle))
  def rowsOnly(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
