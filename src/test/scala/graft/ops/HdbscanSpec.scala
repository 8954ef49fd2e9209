package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted condensed trees for [[Components.hdbscanClusters]] —
  * the q358 gate cross-checks partitions against full-graph
  * reachability in DuckDB; THIS spec pins the condensed-tree semantics
  * themselves (birth-at-true-split, continuation under noise spill,
  * discrete stability sums, excess-of-mass with the tie-prefers-parent
  * rule, descendant veto) on trees small enough to verify by hand.
  *
  * All scenarios use cuts (1, 2, 4) with λ = (4, 2, 1) — gaps
  * (λ0−λ1, λ1−λ2) = (2, 1) — and minSize 5. */
class HdbscanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges(es: (Long, Long, Double)*) = {
    import spark.implicits._
    es.toDF("a", "b", "w")
  }

  private def run(mst: org.apache.spark.sql.DataFrame) =
    Components.hdbscanClusters(mst, cuts = Seq(1.0, 2.0, 4.0),
      lambdas = Seq(4L, 2L, 1L), minSize = 5)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toList

  test("a true split births both children; the split root keeps S = 0") {
    // two 5-chains joined by one loose bridge: the root splits into A/B
    // at cut 2, so A and B are born there and accrue the level-0 mass
    val out = run(edges(
      (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), // A = {1..5}
      (6, 7, 1), (7, 8, 1), (8, 9, 1), (9, 10, 1), // B = {6..10}
      (5, 6, 4))) // bridge only at the top cut
    assert(out == List(
      (2.0, 1L, 5L, 10L, true), // S = 5 members × gap(0)=2
      (2.0, 6L, 5L, 10L, true),
      (4.0, 1L, 10L, 0L, false))) // root: children take the mass
  }

  test("noise spill without a split is a CONTINUATION — same cluster, " +
      "stability accrues across levels") {
    // a 5-chain plus one loosely-attached straggler: {1..6} at cuts 4
    // and 2, {1..5} at cut 1 — one real child per level, no birth below
    // the root, S = 6·gap(1) + 5·gap(0) = 16
    val out = run(edges(
      (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), (5, 6, 2)))
    assert(out == List((4.0, 1L, 6L, 16L, true)))
  }

  test("excess-of-mass: S ≥ ΣV(child) ties prefer the parent, and a " +
      "selected cluster vetoes its descendants") {
    // A/B (5-chains, bridged at 2) merge below a far 6-chain C:
    //  - (cut 2, AB): S=0, children A,B each V=0 → tie → AB chosen,
    //    A and B vetoed;
    //  - (cut 2, C): continues to cut 1 → S = 6·2 = 12, chosen;
    //  - root: ΣV = 0 + 12 > 0 → not chosen.
    val out = run(edges(
      (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), // A
      (6, 7, 1), (7, 8, 1), (8, 9, 1), (9, 10, 1), // B
      (5, 6, 2), // A–B bridge at cut 2
      (11, 12, 1), (12, 13, 1), (13, 14, 1), (14, 15, 1), (15, 16, 1), // C
      (10, 11, 4))) // C joins only at the top
    assert(out == List(
      (1.0, 1L, 5L, 0L, false), // A: born at the bottom, vetoed by AB
      (1.0, 6L, 5L, 0L, false), // B
      (2.0, 1L, 10L, 0L, true), // AB: the tie-prefers-parent rule
      (2.0, 11L, 6L, 12L, true), // C
      (4.0, 1L, 16L, 0L, false)))
  }

  test("sub-minSize components are noise at every level they are small") {
    // a 3-chain never reaches minSize 5: no instances, empty output
    val out = run(edges((1, 2, 1), (2, 3, 1)))
    assert(out.isEmpty)
  }

  test("GLOSH: detachment depth maps to the exact ppm outlier score") {
    // a 5-chain core with two progressively looser stragglers — one
    // condensed cluster (root, continuations at every level), subtree
    // λ_max = λ0 = 4:
    //   nodes 1..5 present at level 0 → λ_attach 4 → score 0 (core)
    //   node 6 attaches at level 1 → 1 − 2/4 → 500000 ppm
    //   node 7 attaches at level 2 → 1 − 1/4 → 750000 ppm
    val out = Components.gloshScores(edges(
        (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), (5, 6, 2), (6, 7, 4)),
      cuts = Seq(1.0, 2.0, 4.0), lambdas = Seq(4L, 2L, 1L), minSize = 5)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(out == List(
      (1L, 1L, 4L, 4L, 0L), (2L, 1L, 4L, 4L, 0L), (3L, 1L, 4L, 4L, 0L),
      (4L, 1L, 4L, 4L, 0L), (5L, 1L, 4L, 4L, 0L),
      (6L, 1L, 2L, 4L, 500000L), (7L, 1L, 1L, 4L, 750000L)))
  }

  test("GLOSH: never-clustered points are not scored") {
    // two points bridged at the top cut never reach minSize: no rows
    val out = Components.gloshScores(edges((1, 2, 4)),
      cuts = Seq(1.0, 2.0, 4.0), lambdas = Seq(4L, 2L, 1L), minSize = 5)
      .collect()
    assert(out.isEmpty)
  }
}
