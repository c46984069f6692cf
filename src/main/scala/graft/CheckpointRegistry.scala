package graft

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic lifecycle for the engine's `localCheckpoint` blocks
  * (r12 optimization round, guide §5).
  *
  * Every batch query path that materializes a shared intermediate routes
  * its checkpoint through [[local]], which records a WEAK reference to
  * the backing RDD. A runner (Bench / Verify) calls [[releaseAll]] after
  * each query's terminal action, so the MEMORY_AND_DISK blocks are
  * dropped the moment the query is done instead of pinning executor
  * storage memory until a driver GC lets ContextCleaner collect them —
  * measured across the 179-query suite the GC-driven lifecycle stacked
  * live blocks across queries (the bench logs were full of
  * "RDD … was locally checkpointed … cannot be recomputed after
  * unpersisting" WARNs at collection time, and storage memory crept
  * between queries).
  *
  * References are weak, so an un-released entry never delays normal GC;
  * a runner that never calls [[releaseAll]] (interactive use, tests)
  * behaves exactly as before. Unpersist is idempotent — paths that also
  * release explicitly (the CC loop, the streaming sink) are unaffected.
  *
  * 100 TB POSTURE (documented tradeoff, conf-switchable): a local
  * checkpoint truncates lineage, so an executor loss after
  * materialization fails the job instead of recomputing. That is the
  * right local/bench default (no cluster store exists, and the blocks
  * are per-invocation scratch). On a cluster with executor churn set
  * `spark.graft.checkpoint.reliable=true` + `spark.graft.checkpoint.dir`
  * and [[local]] routes the same materializations through
  * `Dataset.checkpoint` to reliable storage — identical plans (both are
  * a LogicalRDD barrier), recomputable after loss.
  */
object CheckpointRegistry {

  private val tracked = new ConcurrentLinkedQueue[WeakReference[RDD[_]]]()

  /** Checkpoint `df` (local by default; reliable when
    * `spark.graft.checkpoint.reliable=true`) and track the backing RDD
    * for release at the end of the consuming query. */
  def local(df: DataFrame, eager: Boolean): DataFrame = {
    val conf = df.sparkSession.conf
    val out =
      if (conf.getOption("spark.graft.checkpoint.reliable").contains("true")) {
        conf.getOption("spark.graft.checkpoint.dir")
          .foreach(df.sparkSession.sparkContext.setCheckpointDir)
        df.checkpoint(eager)
      } else df.localCheckpoint(eager)
    out.queryExecution.analyzed match {
      case lr: LogicalRDD => tracked.add(new WeakReference(lr.rdd))
      case _              => ()
    }
    out
  }

  /** Unpersist every tracked checkpoint RDD still alive. Called by the
    * runners after a query's terminal action; safe at any time for
    * per-invocation checkpoints (each query run builds fresh ones). */
  def releaseAll(blocking: Boolean = false): Int = {
    var released = 0
    var ref = tracked.poll()
    while (ref != null) {
      val rdd = ref.get()
      if (rdd != null) {
        rdd.unpersist(blocking)
        released += 1
      }
      ref = tracked.poll()
    }
    released
  }
}
