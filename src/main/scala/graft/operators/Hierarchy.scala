package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening — the reference's taxonomy-tree walk
  * (operators/taxonomy/__init__.py:24 `handle_node`): a recursive
  * generator that emits every node below the root with the '/'-joined
  * names of its ancestors BELOW the root (`breadcrumbs[1:]` — the root's
  * own name never appears in a breadcrumb trail).
  *
  * Spark-first form: a bounded-depth BFS over the (id, parent, name)
  * adjacency — level k+1 is one join of the adjacency against level k,
  * so the whole flatten is O(depth) joins and each round's frontier is
  * level-sized. No recursion on the driver, no collected tree: the
  * adjacency can be arbitrarily wide and stays distributed; AQE
  * broadcasts the frontier when it is small (the taxonomy case) and
  * shuffles when it is not. `localCheckpoint` per round cuts the
  * growing lineage (the q66/q129 iterative-loop posture).
  *
  * The DuckDB oracle replays the same walk as a recursive CTE.
  */
object Hierarchy {

  /** Input columns: `nid` (node id), `parent` (null for roots), `nname`
    * (display name). Output: one row per node with `crumbs` (the
    * ancestors-below-root trail, '' for depth-1 nodes) and `depth`
    * (root = 0); roots are included with depth 0 — callers that mirror
    * handle_node's emission filter on `depth >= 1`. */
  def breadcrumbs(nodes0: DataFrame, maxDepth: Int = 32): DataFrame = {
    // Materialize the adjacency ONCE: every round joins against it, and
    // an unmaterialized lineage would re-run the source scan per level.
    val nodes = nodes0.transform(graft.CheckpointRegistry.local(_, true))
    var frontier = nodes.filter(col("parent").isNull)
      .select(col("nid"), col("nname"), lit("").as("crumbs"), lit(0).as("depth"))
      .transform(graft.CheckpointRegistry.local(_, true))
    var out = frontier
    var d = 0
    while (d < maxDepth && !frontier.isEmpty) {
      val parents = frontier.select(col("nid").as("pid"), col("nname").as("pname"),
        col("crumbs").as("pcrumbs"), col("depth").as("pdepth"))
      val next = nodes.join(parents, col("parent") === col("pid"))
        .select(col("nid"), col("nname"),
          // handle_node passes breadcrumbs + [name] down and joins
          // breadcrumbs[1:]: the root contributes nothing, every other
          // ancestor appends its name.
          when(col("pdepth") === 0, lit(""))
            .when(col("pcrumbs") === "", col("pname"))
            .otherwise(concat(col("pcrumbs"), lit("/"), col("pname"))).as("crumbs"),
          (col("pdepth") + 1).as("depth"))
        .transform(graft.CheckpointRegistry.local(_, true))
      out = out.unionByName(next) // empty-final-level union is a no-op
      frontier = next
      d += 1
    }
    // Fail-loud parity with connectedComponents' round-cap guard: nodes
    // BELOW the cap would be silently dropped while the recursive-CTE
    // oracle walks them — throw rather than return a truncated flatten.
    // The guard checks for CHILDREN of the last frontier (a tree whose
    // deepest level is exactly maxDepth is complete — its final frontier
    // is non-empty but nothing was dropped).
    if (!frontier.isEmpty) {
      val dropped = nodes.join(
        frontier.select(col("nid").as("pid")), col("parent") === col("pid"))
      if (!dropped.isEmpty)
        throw new IllegalStateException(
          s"Hierarchy.breadcrumbs: tree deeper than maxDepth=$maxDepth " +
            "(unvisited children remain below the last level); raise maxDepth or check for a parent cycle")
    }
    out
  }
}
