package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}

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

  /** True iff `path` holds at least one REAL parquet data file,
    * recursing past partition dirs and skipping `_temporary`/dot
    * entries — the ONE shared guard behind every optional-state read:
    * a crash mid-write leaves a dir with only write-orphans inside,
    * and a bare exists() check would then send spark.read.parquet
    * into an unrecoverable 'unable to infer schema'. Goes through the
    * Hadoop FileSystem of the path (HDFS/object-store dirs answer
    * correctly) and recurses on the listing's own FileStatus entries —
    * no per-child re-stat round trips. */
  def hasParquetData(path: String,
                     conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // A child deleted between listStatus and the recursive descent (a
    // concurrent replay swapping its batch dir) means "absent", not an
    // exception — the guard answers a presence question, and a vanished
    // subtree is by definition not presence. Caught per child so a
    // vanished sibling can't hide data elsewhere in the tree.
    def scan(st: org.apache.hadoop.fs.FileStatus): Boolean =
      if (st.isFile) st.getPath.getName.endsWith(".parquet")
      else (try fs.listStatus(st.getPath)
            catch { case _: java.io.FileNotFoundException =>
              Array.empty[org.apache.hadoop.fs.FileStatus] })
        .filterNot(c => c.getPath.getName.startsWith("_") ||
          c.getPath.getName.startsWith("."))
        .exists(scan)
    try fs.exists(root) && scan(fs.getFileStatus(root))
    catch { case _: java.io.FileNotFoundException => false }
  }

  /** Replace a directory via STAGE-AND-RENAME: `write` fills a
    * dot-prefixed sibling staging dir (invisible to parquet partition
    * discovery and to [[hasParquetData]] while in flight), then any live
    * target is deleted and the staged dir promoted with an FS rename.
    * For a writer that must replace a directory concurrent readers may
    * be scanning — a crashed-batch replay overwriting its own per-batch
    * partition — this narrows the visible race from the whole write
    * duration to the delete+rename instant.
    *
    * Atomicity contract, stated precisely: the promotion is two FS calls
    * (delete, then rename), and the rename itself is atomic ONLY on
    * HDFS/local filesystems — on an object store (S3A without a rename
    * layer) rename is a non-atomic copy, so deployments there put a
    * committer or a manifest pointer in front of this. Completeness of a
    * staged dir is carried by an explicit MARKER file written after
    * `write` returns ("target absent ⇒ write completed" would be wrong
    * for a FIRST-EVER write to the target, where a crash mid-`write`
    * also leaves the target absent): a crash between the delete and the
    * rename leaves the target absent with complete, marker-bearing
    * content in `.staging_`, which [[recoverStagedDir]] promotes; a
    * crash during `write` leaves a marker-less staging dir that recovery
    * refuses and the next attempt wipes. The marker is dot-free but
    * underscore-prefixed, so parquet discovery and [[hasParquetData]]
    * ignore it if a crash strands it inside a promoted target. */
  private val StagedCompleteMarker = "_GRAFT_STAGED_COMPLETE"

  def stageAndSwapDir(path: String, conf: org.apache.hadoop.conf.Configuration)
                     (write: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".staging_${target.getName}")
    val fs = target.getFileSystem(conf)
    // wipe any crashed prior attempt: its stale marker must not vouch
    // for this attempt's partial write
    if (fs.exists(staging)) fs.delete(staging, true)
    write(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, StagedCompleteMarker), true).close()
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(staging, target),
      s"failed to promote staged dir $staging -> $target")
    fs.delete(new org.apache.hadoop.fs.Path(target, StagedCompleteMarker), false)
  }

  /** Recovery for [[stageAndSwapDir]]'s one crash window: if the target
    * is absent and its staging sibling carries the completion marker,
    * the writer died between its delete and its rename — promote the
    * staged content and return true. Any other state is not promotable:
    * a marker-LESS staging dir is a crashed partial `write` (whether or
    * not the target exists — a first-ever write has no target either),
    * and a staging dir beside a live target stays invisible until the
    * next swap reclaims it. Call from a reader/owner recovery path
    * before trusting target absence. */
  def recoverStagedDir(path: String,
                       conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".staging_${target.getName}")
    val fs = target.getFileSystem(conf)
    val complete = fs.exists(new org.apache.hadoop.fs.Path(staging, StagedCompleteMarker))
    if (!fs.exists(target) && complete) {
      require(fs.rename(staging, target),
        s"failed to promote orphaned staged dir $staging -> $target")
      fs.delete(new org.apache.hadoop.fs.Path(target, StagedCompleteMarker), false)
      true
    } else false
  }

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

  /** Register a DataFrame as a SQL view — the lightweight end of the
    * to_sql.py publish surface. */
  def registerView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** SQL dump (to_sql.py:26 `dump_to_sql`): persist a parquet-backed
    * TABLE in the session catalog (CREATE TABLE AS semantics — real DDL +
    * data, queryable by name from any spark.sql client on the catalog).
    *
    * The reference's `indexes_fields` map to BUCKETING on those columns:
    * Spark's storage-level analog of a secondary index — equality lookups
    * prune to one bucket file-set, and two tables bucketed the same way
    * join WITHOUT a shuffle (see SourcesSpec's co-located join plan
    * assertion). `sortBy` within buckets gives index-like ordered scans.
    */
  def dumpToTable(df: DataFrame, name: String,
                  indexFields: Seq[String] = Nil, nBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    // Idempotent DDL: drop any previous table, and clear an orphaned
    // local managed location (the in-memory catalog forgets tables across
    // sessions while their warehouse directories survive).
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    if (warehouse.getScheme == null || warehouse.getScheme == "file") {
      // Spark lowercases managed-table directory names: check the path the
      // table ACTUALLY uses or a mixed-case name skips cleanup and then
      // fails saveAsTable on the surviving non-empty location
      val loc = java.nio.file.Paths.get(warehouse.getPath, name.toLowerCase).toFile
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    val bucketed =
      if (indexFields.nonEmpty)
        w.bucketBy(nBuckets, indexFields.head, indexFields.tail: _*)
          .sortBy(indexFields.head, indexFields.tail: _*)
      else w
    bucketed.saveAsTable(name)
  }

  /** Training-shard publish: write documents as `shard=N/` parquet
    * partitions in the deterministic (hash, doc_id) order q82 defines, so
    * re-runs produce identically-ordered shards and a training job reads
    * its shard with one partition-pruned sequential scan. The companion
    * manifest (q100) is the validation artifact: per-shard row/token/byte
    * totals plus an ORDER-INSENSITIVE content checksum (sum of per-doc
    * 32-bit content hashes), so a restored or re-published shard can be
    * checked without comparing bodies. `repartition(shard)` before the
    * sort keeps one writer task per shard (no tiny-file spray);
    * `partitionBy` makes the shard column a directory, prunable at read.
    */
  def writeTrainingShards(docs: DataFrame, path: String, nShards: Int = 16): Unit = {
    val h = graft.operators.Sampling.saltedHash32(col("doc_id"), "shard")
    docs
      .withColumn("h", h)
      .withColumn("shard", col("h") % nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
  }
}
