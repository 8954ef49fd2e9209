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
}
