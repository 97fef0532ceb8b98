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

  /** Connected components by iterative min-label propagation with a
    * DELTA frontier: every node starts labeled with itself; each round
    * every node takes the minimum label among neighbors whose label
    * CHANGED last round; converged when no label changed. Labels are
    * monotone non-increasing, so an unchanged neighbor's contribution
    * was already folded in the round after it last changed — joining
    * the full label table every round would recompute exactly those
    * settled contributions. Per-round work is therefore ∝ edges
    * incident to the frontier, which collapses after the first rounds
    * (in a dense near-dup cluster most nodes settle immediately); the
    * result is bit-identical to full propagation because every change
    * reaches every neighbor on the following round. The result is
    * deterministic (min over a set) and each round is ONE aggregate +
    * ONE join, both keyed and map-side combinable — per-node state is
    * a single long, never a neighbor list, so high-degree nodes cost
    * nothing beyond their edge rows.
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
    * [[VectorOps.kmeansCentroids]]'s per-iteration materialization) —
    * and the RETIRED round's blocks are freed immediately
    * ([[Engine.unstage]]), so peak block storage is two label frames,
    * not O(rounds). NB EAGER: each round runs ONE Spark job at call
    * time — a noop-sink write that materializes the staged next-labels
    * frame while a changed-count accumulator rides along in the same
    * tasks (round-4 VERDICT item 6: no dedicated convergence job).
    * Accumulator retry overcounting is benign here: only changed==0
    * stops the loop, and a truly unchanged round adds nothing from any
    * task attempt. Driver state is one changed-count long per round —
    * labels themselves never leave the cluster.
    * Rounds-to-convergence is returned per call by
    * [[connectedComponentsOfWithRounds]] (telemetry: cluster shapes
    * that stop converging in few rounds are the signal to swap in
    * large-star/small-star).
    *
    * Input: an edge frame with `src`/`dst` columns (undirected; both
    * orientations are derived). Output: (node, component) with
    * component = min node id reachable, one row per node that appears
    * in any edge.
    */
  def connectedComponentsOf(edges: DataFrame, src: String, dst: String,
      maxIters: Int = 25): DataFrame =
    connectedComponentsOfWithRounds(edges, src, dst, maxIters)._1

  /** [[connectedComponentsOf]] plus the rounds it took to converge
    * (including the final no-change round) — returned per call rather
    * than via JVM-global mutable telemetry, so concurrent component
    * computations can't observe each other's counts. */
  def connectedComponentsOfWithRounds(edges: DataFrame, src: String,
      dst: String, maxIters: Int = 25): (DataFrame, Int) = {
    val (labels, rounds, converged) =
      propagateWithRounds(edges, src, dst, maxIters)
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds")
    (labels, rounds)
  }

  /** The propagation loop itself, reporting convergence instead of
    * throwing — the building block [[connectedComponentsAuto]] needs to
    * escalate cleanly. On the non-converged path every staged frame is
    * retired before returning (the partial labels are useless). */
  private def propagateWithRounds(edges: DataFrame, src: String,
      dst: String, maxIters: Int): (DataFrame, Int, Boolean) = {
    val spark = edges.sparkSession
    val e = Engine.stage(
      edges.select(col(src).as("src"), col(dst).as("dst"))
        .unionByName(edges.select(col(dst).as("src"), col(src).as("dst")))
        .distinct())
    var stagedLabels = Engine.stage(
      e.select(col("src").as("node")).distinct()
        .withColumn("comp", col("node")))
    var labels = stagedLabels
    var delta = labels // round 1's frontier: every node just "changed"
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxIters) {
      val acc = spark.sparkContext.longAccumulator("graft.cc.changed")
      val flag = udf { c: Boolean => if (c) acc.add(1L); c }
      // min label pushed FROM the frontier, one row per receiving node;
      // the changed flag is a column of the staged frame so the
      // accumulator update happens inside the materializing job's tasks
      val nbr = e.join(delta.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("nbr_comp"))
      val next = Engine.stage(labels.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("next_comp"), col("comp").as("prev"))
        .select(col("node"), col("next_comp").as("comp"),
          flag(col("next_comp") =!= col("prev")).as("chg")))
      next.write.format("noop").mode("overwrite").save()
      changed = acc.value
      Engine.unstage(stagedLabels)
      stagedLabels = next
      labels = next.select(col("node"), col("comp"))
      // next round's frontier reads the materialized chg column — no
      // recomputation, no extra staging (a filter over next's blocks)
      delta = next.filter(col("chg")).select(col("node"), col("comp"))
      rounds += 1
    }
    Engine.unstage(e)
    if (changed == 0L) (labels, rounds, true) // labels stay live for caller
    else {
      Engine.unstage(stagedLabels) // partial labels are useless — free them
      (labels, rounds, false)
    }
  }

  /** Connected components with AUTOMATIC depth escalation — the
    * round-10 sf1 scale rehearsal's lesson made code: delta-frontier
    * min-label propagation converges in diameter-many rounds, which is
    * a handful on the dense near-dup graphs this family usually sees —
    * but the 10× fixture produced a component of diameter > 25 and the
    * loud guard fired mid-bench (exactly what the guard is for). Rather
    * than asking callers to know their diameter, this runs propagation
    * for up to `propIters` rounds (cheap, collapses dense cores) and on
    * non-convergence discards the partial labels and restarts with the
    * alternating large/small-star formulation, whose O(log n) round
    * bound is diameter-independent. The escalation wastes the
    * propagation rounds — acceptable because deep graphs are the rare
    * case and shallow graphs (the common case) keep propagation's
    * smaller constant factor. Both algorithms produce the identical
    * (node, min-reachable-id) contract, so which one answered is
    * unobservable in the result. */
  def connectedComponentsAuto(edges: DataFrame, src: String, dst: String,
      propIters: Int = 12, altIters: Int = 30): DataFrame = {
    val (labels, _, converged) =
      propagateWithRounds(edges, src, dst, propIters)
    if (converged) labels
    else connectedComponentsAlternating(edges, src, dst, altIters)
  }

  /** Connected components by ALTERNATING large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the documented swap for adversarial long-chain graphs where
    * min-label propagation's diameter-many rounds dominate: this
    * converges in O(log n) rounds by rewriting edges toward component
    * minima instead of propagating labels one hop per round.
    *
    *  - large-star(u): every neighbor LARGER than u re-points to
    *    m = min(closed neighborhood of u);
    *  - small-star(u): every neighbor smaller than u (and u itself)
    *    re-points to the minimum of that smaller set.
    *
    * Both are expressed as one keyed min-aggregate + one join over the
    * edge frame — never a collected neighbor list, so per-node state
    * stays O(1) and high-degree nodes cost only their edge rows (the
    * same discipline as [[connectedComponentsOf]]). Edges always point
    * (child → smaller parent), so the fixpoint is a star forest:
    * every edge is (node, component-min). Convergence = the edge set
    * is unchanged by a large+small round — checked EXACTLY (symmetric
    * difference) but inside the round's own materializing job: the
    * rewritten set full-outer-joins the previous one and a
    * changed-edges accumulator rides the same tasks, so each round is
    * ONE job (was: two exceptAll set-difference jobs per round).
    * Each round stages its edge frame and retires the previous one
    * ([[Engine.unstage]]).
    *
    * Output contract matches [[connectedComponentsOf]]: (node, comp),
    * one row per node that appears in any input edge, comp = min node
    * id of its component. [[connectedComponentsAlternatingWithRounds]]
    * reports the large+small rounds per call. Prefer
    * [[connectedComponentsOf]] for near-dup graphs (shallow diameter,
    * smaller constant factor); prefer this when the diameter is
    * unknown or adversarial. */
  def connectedComponentsAlternating(edges: DataFrame, src: String,
      dst: String, maxIters: Int = 30): DataFrame =
    connectedComponentsAlternatingWithRounds(edges, src, dst, maxIters)._1

  /** [[connectedComponentsAlternating]] plus its large+small round
    * count (including the final no-change round) — per call, not
    * JVM-global. */
  def connectedComponentsAlternatingWithRounds(edges: DataFrame,
      src: String, dst: String, maxIters: Int = 30): (DataFrame, Int) = {
    val spark = edges.sparkSession
    // canonical child→parent orientation: (a, b) with b < a
    var stagedE = Engine.stage(
      edges.select(greatest(col(src), col(dst)).as("a"),
          least(col(src), col(dst)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    var e = stagedE
    // nodes of the ORIGINAL graph — star rewriting drops interior
    // nodes from the edge set, the final join restores them
    val nodes = Engine.stage(
      edges.select(col(src).as("node"))
        .unionByName(edges.select(col(dst).as("node"))).distinct())
    def sym(d: DataFrame): DataFrame =
      d.unionByName(d.select(col("b").as("a"), col("a").as("b")))
    def largeStar(d: DataFrame): DataFrame = {
      val s = sym(d)
      val mins = s.groupBy(col("a").as("u"))
        .agg(min(col("b")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      s.filter(col("b") > col("a")) // neighbor v=b larger than u=a
        .join(mins, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(d: DataFrame): DataFrame = {
      val s = sym(d).filter(col("b") < col("a")) // smaller neighbors of u=a
      val mins = s.groupBy(col("a").as("u")).agg(min(col("b")).as("m"))
      s.join(mins, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxIters) {
      val acc = spark.sparkContext.longAccumulator("graft.ccAlt.changed")
      val flag = udf { c: Boolean => if (c) acc.add(1L); c }
      // the round's rewrite full-outer-joined against the previous edge
      // set: a row absent on either side is a changed edge, flagged via
      // the accumulator inside the SAME tasks that materialize the
      // staged frame. Old-only rows ride along solely to be counted;
      // `keep` excludes them from the next round's edges. Accumulator
      // retry overcounting is benign (only changed==0 stops the loop).
      val next = Engine.stage(
        smallStar(largeStar(e)).withColumn("__new", lit(true))
          .join(e.select(col("a"), col("b"), lit(true).as("__old")),
            Seq("a", "b"), "full_outer")
          .select(col("a"), col("b"),
            flag(col("__new").isNull || col("__old").isNull).as("chg"),
            col("__new").isNotNull.as("keep")))
      next.write.format("noop").mode("overwrite").save()
      changed = acc.value
      Engine.unstage(stagedE)
      stagedE = next
      e = next.filter(col("keep")).select(col("a"), col("b"))
      rounds += 1
    }
    require(changed == 0L,
      s"alternating components did not converge in $maxIters rounds")
    val out = nodes.join(e.select(col("a").as("node"), col("b").as("comp")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
    (out, rounds)
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
    // auto-escalating: propagation for shallow graphs, alternating-star
    // past propIters rounds (the sf1 rehearsal surfaced a > 25-diameter
    // component — see connectedComponentsAuto)
    val cc = connectedComponentsAuto(pairs, "doc_a", "doc_b")
    cc.select(col("node").as("doc_id"), col("comp").as("component"),
      count(lit(1)).over(Window.partitionBy(col("comp"))).as("cluster_n"))
      .orderBy(col("doc_id"))
  }
}
