package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
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

  test("soft membership: points score against their SELECTED ancestor's " +
      "subtree depth; unselected-root attachments are unscored") {
    // A{1..5}/B{6..10} bridged at 2 under a far C-chain{11..16} with a
    // loose straggler 17 (joins C at 2) and an outlier 18 (root-only):
    //  - selection: AB (tie-prefers-parent) and C are selected, A/B
    //    vetoed, root loses the excess-of-mass vote;
    //  - nodes 1..16 attach at level 0 = the subtree's deepest density
    //    → prob exactly 10⁶ against their selected ancestor (AB for
    //    A/B members — NOT the vetoed A/B);
    //  - straggler 17 attaches at level 1 → λ 2 / λ_max 4 → 500000;
    //  - outlier 18's attachment is the UNSELECTED root → no row.
    val mst = edges(
      (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1), // A
      (6, 7, 1), (7, 8, 1), (8, 9, 1), (9, 10, 1), // B
      (5, 6, 2), // A–B bridge
      (11, 12, 1), (12, 13, 1), (13, 14, 1), (14, 15, 1), (15, 16, 1), // C
      (16, 17, 2), // straggler
      (10, 11, 4), (17, 18, 4)) // root-level joins
    val labels = Components.singleLinkageLabels(mst, Seq(1.0, 2.0, 4.0))
    val out = Components.softMembershipsFromLabels(labels,
      cuts = Seq(1.0, 2.0, 4.0), lambdas = Seq(4L, 2L, 1L), minSize = 5)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    val full = (1L to 10L).map(n => (n, 1L, 4L, 4L, 1000000L)) ++
      (11L to 16L).map(n => (n, 11L, 4L, 4L, 1000000L))
    assert(out == (full :+ ((17L, 11L, 2L, 4L, 500000L))).toList)
  }

  // ---- r15: mutual-reachability semantics (q360). Fixture: two tight
  // 5-point blobs joined by a sparse 5-point bridge chain — the classic
  // configuration where raw-distance single linkage and HDBSCAN proper
  // disagree.
  private lazy val blobsAndBridge: Seq[(Long, Double, Double)] = {
    def blob(base: Long, x0: Double) = Seq(
      (base, x0, 0.0), (base + 1, x0 + 0.01, 0.0), (base + 2, x0, 0.01),
      (base + 3, x0 + 0.01, 0.01), (base + 4, x0 + 0.005, 0.005))
    // bridge spacing is 0.02 from BOTH blob edges (0.01 → 0.03 … 0.11 →
    // 0.13): every chain point is sparse, so its core distance exceeds
    // the chain-link distance on either side
    blob(1L, 0.0) ++ blob(10L, 0.13) ++
      Seq((20L, 0.03, 0.0), (21L, 0.05, 0.0), (22L, 0.07, 0.0),
        (23L, 0.09, 0.0), (24L, 0.11, 0.0))
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mutualReachEdges matches the brute-force definition exactly " +
      "(core = (minPts-1)-th candidate distance, w = max(cores, d2))") {
    import spark.implicits._
    val pts = blobsAndBridge.toDF("id", "x", "y")
    val got = Components.mutualReachEdges(pts, eps = 0.05, eps2 = 0.0025,
        minPts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // driver-side brute force from the definition
    val d2 = (for {
      (a, ax, ay) <- blobsAndBridge; (b, bx, by) <- blobsAndBridge
      if a != b
      w = round9((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
      if w <= 0.0025
    } yield (a, b, w))
    val core = d2.groupBy(_._1).collect {
      case (id, cands) if cands.size >= 4 =>
        id -> cands.map(_._3).sorted.apply(3)
    }
    val want = (for {
      (a, b, w) <- d2 if a < b
      ca <- core.get(a); cb <- core.get(b)
    } yield (a, b, math.max(w, math.max(ca, cb)))).toSet
    assert(got == want)
  }

  test("mutual reachability severs the sparse bridge raw-distance " +
      "single linkage merges through") {
    import spark.implicits._
    val pts = blobsAndBridge.toDF("id", "x", "y")
    def componentsAt(edges: org.apache.spark.sql.DataFrame,
        cut: Double): Seq[Long] = {
      val e = edges.where(col("w") <= cut)
        .select(col("a").as("id_a"), col("b").as("id_b"))
      val nodes = e.select(col("id_a").as("id"))
        .union(e.select(col("id_b").as("id"))).distinct()
      Components.connectedComponents(nodes, e)
        .groupBy("lbl").count().collect().map(_.getLong(1)).toSeq.sorted
    }
    val raw = Components.gridEpsPairs(pts, 0.05, 0.0025)
      .where(col("ia") < col("ib"))
      .select(col("ia").as("a"), col("ib").as("b"), col("w"))
    val mr = Components.mutualReachEdges(pts, 0.05, 0.0025, minPts = 5)
    // raw metric at cut 0.0004: the 0.02-spaced chain (d2 = 0.0004)
    // links everything into ONE 15-point component
    assert(componentsAt(raw, 0.0004) == Seq(15L))
    // mutual reachability at the same cut: every chain point's 4th-NN
    // is >= 0.0005 away (squared), so its core distance lifts all its
    // edges past the cut — the blobs stand alone
    assert(componentsAt(mr, 0.0004) == Seq(5L, 5L))
  }

  test("GLOSH: never-clustered points are not scored") {
    // two points bridged at the top cut never reach minSize: no rows
    val out = Components.gloshScores(edges((1, 2, 4)),
      cuts = Seq(1.0, 2.0, 4.0), lambdas = Seq(4L, 2L, 1L), minSize = 5)
      .collect()
    assert(out.isEmpty)
  }
}
