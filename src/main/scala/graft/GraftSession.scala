package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local runs use `local[N]` with shuffle partitions = N; on a real cluster
  * the same builder is used with master unset (spark-submit provides it) and
  * shuffle partitions sized to ~2-3x total cores. AQE (on by default in
  * Spark 4) re-plans shuffles at runtime: coalesces small partitions and
  * splits skewed ones, which is the posture we want at 100 TB.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(Some(s"local[$cores]"), cores).getOrCreate()

  def builder(master: Option[String], shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      // native expressions in the SQL registry + the TopKPerKey planner
      // strategy; spark-submit users get the same via
      // --conf spark.sql.extensions=graft.GraftExtensions
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // ObjectHashAggregate (collect_list/collect_set and the sketch
      // aggregates) falls back to SORT-based aggregation once a task sees
      // this many groups — the default (128) silently turns every
      // collect-shaped groupBy into a per-partition sort. Group payloads
      // here are small arrays; keep hashing. On a memory-tight cluster
      // this is the first knob to revisit.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // catalog tables (Sources.dumpToTable) land outside the repo; a real
      // deployment points this at shared storage
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
    master.fold(b)(b.master)
  }
}
