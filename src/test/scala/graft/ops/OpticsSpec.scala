package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted MST forests for [[Components.opticsOrder]] — the q364
  * gate cross-checks against DuckDB's recursive path-key walk at
  * sf0.01; THIS spec pins the traversal semantics themselves on trees
  * small enough to trace by hand:
  *
  *  - reachability = parent-edge weight in the min-id-rooted tree
  *    (traversal-independent, OPTICS's attach value);
  *  - the plot order is the weight-ascending Euler-tour DFS, whose
  *    child order at an interior node is CYCLIC-AFTER-THE-PARENT in
  *    the (w, neighbor) ring — NOT plain ascending (the case that
  *    distinguishes the Euler tour from a naive priority DFS);
  *  - forests: every component is its own plot, rooted at its min id,
  *    position 0 with UNDEFINED (null) reachability;
  *  - the reach multiset equals the MST weight multiset (every tree
  *    edge is exactly one node's parent edge). */
class OpticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(es: (Long, Long, Double)*): List[(Long, Long, Long, Option[Double])] = {
    import spark.implicits._
    Components.opticsOrder(es.toDF("a", "b", "w"))
      .orderBy("comp", "pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toList
  }

  test("a path-plus-branch tree orders as the weight-ascending DFS " +
      "from the min-id root, reach = parent-edge weight") {
    // root 1: ring [(1.0, 2), (3.0, 4)]; at 2 (entered from 1): ring
    // [(1.0, 1), (2.0, 3)] → after-parent = 3. Tour: 1, 2, 3, back,
    // back, 4.
    val out = run((1, 2, 1.0), (2, 3, 2.0), (1, 4, 3.0))
    assert(out == List(
      (1L, 1L, 0L, None),
      (2L, 1L, 1L, Some(1.0)),
      (3L, 1L, 2L, Some(2.0)),
      (4L, 1L, 3L, Some(3.0))))
  }

  test("child order is cyclic-after-the-parent, not plain ascending") {
    // at node 8, entered from parent 1 via w=2.0: ring
    // [(1.0, 5), (2.0, 1), (3.0, 9)] → children after the parent's
    // ring position first: 9 (w=3.0), THEN wrap to 5 (w=1.0) — the
    // lighter child is visited LAST because it precedes the parent in
    // the ring.
    val out = run((1, 8, 2.0), (8, 9, 3.0), (5, 8, 1.0))
    assert(out == List(
      (1L, 1L, 0L, None),
      (8L, 1L, 1L, Some(2.0)),
      (9L, 1L, 2L, Some(3.0)),
      (5L, 1L, 3L, Some(1.0))))
  }

  test("a forest yields one plot per component, each rooted at its " +
      "min id with null reachability at position 0") {
    val out = run((7, 3, 1.0), (3, 5, 0.5), (20, 11, 2.0))
    assert(out == List(
      (3L, 3L, 0L, None),
      (5L, 3L, 1L, Some(0.5)),
      (7L, 3L, 2L, Some(1.0)),
      (11L, 11L, 0L, None),
      (20L, 11L, 1L, Some(2.0))))
  }

  test("two-node component: root then leaf") {
    val out = run((42, 17, 9.25))
    assert(out == List(
      (17L, 17L, 0L, None),
      (42L, 17L, 1L, Some(9.25))))
  }

  test("the reach multiset equals the MST weight multiset") {
    val es = Seq[(Long, Long, Double)](
      (1, 2, 5.0), (2, 3, 1.0), (2, 4, 4.0), (4, 5, 2.0), (1, 6, 3.0),
      (6, 7, 7.0))
    val out = run(es: _*)
    assert(out.flatMap(_._4).sorted == es.map(_._3).sorted.toList)
    // positions are a permutation of 0..n-1 within the component
    assert(out.map(_._3).sorted == (0L until 7L).toList)
  }

  // ---- q373: ExtractDBSCAN over handcrafted plots (VERDICT r15 #5) ----

  private def extract(eps: Double, minSize: Int,
      rows: (Long, Long, Long, Option[Double])*)
      : List[(Long, Option[Long], Option[Long])] = {
    import spark.implicits._
    val plot = rows.map { case (v, c, p, r) =>
      (v, c, p, r.map(Double.box).orNull.asInstanceOf[java.lang.Double])
    }.toDF("vec_id", "comp", "pos", "reach")
    Components.opticsExtractClusters(plot, eps, minSize)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toList
  }

  test("extraction: a valley of reach ≤ ε plus its root anchor is one " +
      "cluster named by its min id; a short second valley is noise") {
    // plot: root(10, null) 11(.1) 12(.1) 13(.2) 14(.1) | 15(.9 boundary)
    // 16(.1) 17(.1) — segment 1 = {10..14} size 5 ≥ 5 → cluster 10;
    // segment 2 = {15, 16, 17} size 3 < 5 → noise
    val out = extract(0.5, 5,
      (10, 10, 0, None), (11, 10, 1, Some(0.1)), (12, 10, 2, Some(0.1)),
      (13, 10, 3, Some(0.2)), (14, 10, 4, Some(0.1)),
      (15, 10, 5, Some(0.9)), (16, 10, 6, Some(0.1)),
      (17, 10, 7, Some(0.1)))
    assert(out == List(
      (10L, Some(10L), Some(5L)), (11L, Some(10L), Some(5L)),
      (12L, Some(10L), Some(5L)), (13L, Some(10L), Some(5L)),
      (14L, Some(10L), Some(5L)), (15L, None, None),
      (16L, None, None), (17L, None, None)))
  }

  test("extraction: a boundary point anchors the NEXT valley and joins " +
      "its cluster when the segment reaches minSize") {
    // boundary 23 (reach .9) + valley {24, 25} of reach ≤ ε: segment
    // size 3 ≥ 3 → cluster named 23 (the anchor merges in); the
    // leading root pair {20, 21, 22} also sizes 3 → its own cluster
    val out = extract(0.5, 3,
      (20, 20, 0, None), (21, 20, 1, Some(0.2)), (22, 20, 2, Some(0.3)),
      (23, 20, 3, Some(0.9)), (24, 20, 4, Some(0.1)),
      (25, 20, 5, Some(0.2)))
    assert(out == List(
      (20L, Some(20L), Some(3L)), (21L, Some(20L), Some(3L)),
      (22L, Some(20L), Some(3L)), (23L, Some(23L), Some(3L)),
      (24L, Some(23L), Some(3L)), (25L, Some(23L), Some(3L))))
  }

  test("extraction: singleton components and consecutive boundaries " +
      "are noise; exact-ε reach stays inside the valley") {
    // comp 30: root + reach exactly ε (NOT > ε, stays) + one more →
    // size 3 cluster at minSize 3; comp 40: singleton root → noise;
    // comp 50: root then two boundary rows → three size-1 segments
    val out = extract(0.5, 3,
      (30, 30, 0, None), (31, 30, 1, Some(0.5)), (32, 30, 2, Some(0.4)),
      (40, 40, 0, None),
      (50, 50, 0, None), (51, 50, 1, Some(0.8)), (52, 50, 2, Some(0.7)))
    assert(out == List(
      (30L, Some(30L), Some(3L)), (31L, Some(30L), Some(3L)),
      (32L, Some(30L), Some(3L)), (40L, None, None),
      (50L, None, None), (51L, None, None), (52L, None, None)))
  }

  test("opticsOrder rejects a FINER-than-components label frame instead " +
      "of silently emitting wrong positions (ADVICE r15)") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0)).toDF("a", "b", "w")
    // 3 labeled as its own component — splits tree edge (2,3)
    val finer = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "lbl")
    val e = intercept[IllegalArgumentException] {
      Components.opticsOrder(edges, compLabels = Some(finer)).collect()
    }
    assert(e.getMessage.contains("split a tree edge"))
    // wrong root convention (labels not min member ids) also rejected
    val badRoot = Seq((1L, 2L), (2L, 2L), (3L, 2L)).toDF("node", "lbl")
    val e2 = intercept[IllegalArgumentException] {
      Components.opticsOrder(edges, compLabels = Some(badRoot)).collect()
    }
    assert(e2.getMessage.contains("min-member-id"))
  }
}
