package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the IVF-blocked path (q34) is measured against the exact
  * brute-force top-k (q29) — the recall/number-of-probes trade every
  * large-scale ANN deployment tunes. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF recall vs brute force is measured and bounded") {
    val exact = SparkEntry.queries("q29_cosine_knn")(spark, TestSpark.sf0001)
      .collect().filter(_.getLong(1) <= 3)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SparkEntry.queries("q34_ann_ivf")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.size == exact.size)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF@1-probe recall vs exact top-3: $recall%.2f")
    assert(recall >= 0.0 && recall <= 1.0)
    // same result cardinality per query: 5 queries x top-3
    assert(ivf.size == 15)
  }

  test("brute-force kNN returns k ordered neighbors per query") {
    val rows = SparkEntry.queries("q29_cosine_knn")(spark, TestSpark.sf0001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 5)
    byQuery.values.foreach { rs =>
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.sorted.reverse.toSeq == cos.toSeq, "descending by similarity")
    }
  }
}
