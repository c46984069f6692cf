package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface (SURVEY.md §2.D).
  *
  * The reference's I/O endpoints (Airtable, CKAN, S3, Elasticsearch, SQL
  * dumps — zero-egress here) reduce to: columnar/delimited/JSON datasets
  * in, datasets + derived documents out. These helpers standardize the
  * options so every pipeline reads/writes the same way, and keep writes
  * partition-parallel (no single-file coalesce unless asked).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with header + explicit schema inference off the first file only.
    * (At 100 TB you pass an explicit schema; inference is a dev nicety.) */
  def readCsv(spark: SparkSession, path: String, inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Parquet dump — the engine's `dump_to_path`. Writers stay parallel;
    * pass partitionCols to produce partition-pruned layouts for readers. */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Register a DataFrame as a SQL view — the reference's to_sql.py dump
    * becomes "make it queryable with spark.sql". */
  def registerView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)
}
