package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine

/** Distributed graph primitives for the dedup family: near-dup PAIRS
  * are only half the dedup story — keep-one-per-cluster needs the
  * transitive closure of the pair relation, i.e. connected components
  * (A~B, B~C puts A,C in one cluster even if the pair stage never
  * compared them).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every
    * node starts labeled with itself; each round every node takes the
    * minimum label in its closed neighborhood; converged when no label
    * changed. The result is deterministic (min over a set) and each
    * round is ONE aggregate + ONE join, both keyed and map-side
    * combinable — per-node state is a single long, never a neighbor
    * list, so high-degree nodes cost nothing beyond their edge rows.
    *
    * Rounds needed = graph diameter. Near-dup graphs are dense
    * clusters (band-bucket candidates form cliques-with-chips), so the
    * diameter is small and propagation converges in a few rounds; for
    * adversarial long-chain graphs the large-star/small-star
    * formulation (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") converges in O(log n) rounds at the cost of edge
    * rewriting — the swap is local to this method if such graphs ever
    * appear. `maxIters` bounds the driver loop regardless.
    *
    * Iterative frames are re-staged each round ([[Engine.stage]]) —
    * without truncation the lineage doubles per round and Catalyst
    * re-optimization dominates (same discipline as
    * [[VectorOps.kmeansCentroids]]'s per-iteration materialization).
    * NB EAGER: the convergence check runs a Spark job per round at
    * call time. Driver state is one changed-count long per round —
    * labels themselves never leave the cluster.
    *
    * Input: an edge frame with `src`/`dst` columns (undirected; both
    * orientations are derived). Output: (node, component) with
    * component = min node id reachable, one row per node that appears
    * in any edge.
    */
  def connectedComponentsOf(edges: DataFrame, src: String, dst: String,
      maxIters: Int = 25): DataFrame = {
    val e = Engine.stage(
      edges.select(col(src).as("src"), col(dst).as("dst"))
        .unionByName(edges.select(col(dst).as("src"), col(src).as("dst")))
        .distinct())
    var labels = Engine.stage(
      e.select(col("src").as("node")).distinct()
        .withColumn("comp", col("node")))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // min label over the open neighborhood, one row per node
      val nbr = e.join(labels.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("nbr_comp"))
      val next = Engine.stage(labels.join(nbr, Seq("node"), "left")
        .select(col("node"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp")))
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels = next.select(col("node"), col("comp"))
      i += 1
    }
    require(changed == 0L,
      s"connectedComponents did not converge in $maxIters rounds")
    labels
  }

  /** `q_dup_components`: near-dup CLUSTERS from the simhash pair
    * operator — the transitive closure [[TextOps.simhashPairs]] itself
    * doesn't compute. One row per clustered doc with its component
    * representative (min doc_id — the survivor keep-one-per-cluster
    * would keep) and the cluster size. Pure pipeline composition: the
    * pair stage's caps and dup hardening carry over unchanged. */
  def dupComponents(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val pairs = TextOps.simhashPairs(spark, sfDir)
    val cc = connectedComponentsOf(pairs, "doc_a", "doc_b")
    cc.select(col("node").as("doc_id"), col("comp").as("component"),
      count(lit(1)).over(Window.partitionBy(col("comp"))).as("cluster_n"))
      .orderBy(col("doc_id"))
  }
}
