package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** [[graft.operators.GraphOps.connectedComponentsOf]] on synthetic
  * graphs the near-dup tables don't exhibit: long chains (diameter =
  * rounds), multiple components, cliques, and the iteration bound.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIters: Int = 25) =
    GraphOps.connectedComponentsOf(
      edges.toDF("src", "dst"), "src", "dst", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and separate components all collapse to min id") {
    // chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
    val got = cc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("propagation distance: a 12-node chain converges (diameter rounds)") {
    val edges = (1L until 12L).map(i => (i, i + 1))
    val (df, rounds) = GraphOps.connectedComponentsOfWithRounds(
      edges.toDF("src", "dst"), "src", "dst")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 12)
    // telemetry: min-label propagation on an 11-edge chain needs the
    // full diameter of rounds plus the final no-change round
    assert(rounds == 12, s"rounds=$rounds")
  }

  test("convergence frees retired round frames; only live staged blocks remain") {
    Engine.clearStaged()
    val edges = (1L until 8L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(1L))
    // per-round staged frames and the edge frame were unstaged in-loop;
    // only the FINAL labels frame's blocks may remain
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 1, s"staged blocks leaked: $live RDDs still persistent")
    Engine.clearStaged()
  }

  test("maxIters too small for the diameter fails loudly, not wrongly") {
    val edges = (1L until 12L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException](cc(edges, maxIters = 2))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("edge orientation and duplicate edges are irrelevant") {
    val a = cc(Seq((1L, 2L), (2L, 3L)))
    val b = cc(Seq((2L, 1L), (3L, 2L), (1L, 2L), (2L, 3L)))
    assert(a == b)
  }

  private def ccAlt(edges: Seq[(Long, Long)], maxIters: Int = 30) =
    GraphOps.connectedComponentsAlternating(
      edges.toDF("src", "dst"), "src", "dst", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating large/small-star agrees with min-label propagation") {
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)),
      (1L until 12L).map(i => (i, i + 1)),
      Seq((7L, 3L), (3L, 9L), (9L, 7L), (100L, 50L)), // cycle + pair
      Seq((5L, 5L), (6L, 7L)) // self-loop degenerates, pair survives
    )
    graphs.foreach { g =>
      val viaLabels = cc(g.filter(e => e._1 != e._2)) // label CC keeps self-loop nodes
      val viaStars = ccAlt(g).filter { case (n, _) =>
        g.exists(e => e._1 != e._2 && (e._1 == n || e._2 == n)) }
      assert(viaStars == viaLabels, s"graph $g")
    }
  }

  test("alternating converges in far fewer rounds than a long chain's diameter") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val (df, rounds) = GraphOps.connectedComponentsAlternatingWithRounds(
      chain.toDF("src", "dst"), "src", "dst")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L) && got.size == 64)
    // 63-hop diameter: label propagation needs 64 rounds, star rewriting O(log n)
    assert(rounds <= 12, s"rounds=$rounds")
  }

  test("dupComponents reconciles with the pair operator") {
    import graft.operators.TextOps
    val pairs = TextOps.simhashPairs(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val comp = GraphOps.dupComponents(spark, sfDir)
    val byDoc = comp.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("cluster_n"))).toMap
    // every paired doc is clustered, pairs land in the same component
    pairs.foreach { case (a, b) =>
      assert(byDoc.contains(a) && byDoc.contains(b))
      assert(byDoc(a)._1 == byDoc(b)._1, s"pair ($a,$b) split")
    }
    // component id is the min member; cluster_n counts members exactly
    val members = byDoc.toSeq.groupBy(_._2._1)
    members.foreach { case (compId, ms) =>
      assert(ms.map(_._1).min == compId)
      assert(ms.forall(_._2._2 == ms.size.toLong))
    }
  }

  test("auto escalation: a chain deeper than propIters converges via alternating") {
    import spark.implicits._
    // diameter 80 >> propIters=5: propagation alone would fail loudly,
    // auto must discard the partial labels and answer via the
    // alternating formulation with the identical contract
    val chain = (0L until 80L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      GraphOps.connectedComponentsOf(chain, "a", "b", maxIters = 5)
    }
    val auto = GraphOps.connectedComponentsAuto(chain, "a", "b",
      propIters = 5).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(auto.length == 81 && auto.forall(_._2 == 0L))
    // shallow graphs still answer on the propagation path (converges
    // within propIters) and match the alternating result exactly
    val shallow = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val viaAuto = GraphOps.connectedComponentsAuto(shallow, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val viaAlt = GraphOps.connectedComponentsAlternating(shallow, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(viaAuto == viaAlt)
  }
}
