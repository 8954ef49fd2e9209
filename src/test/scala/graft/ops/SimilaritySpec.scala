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

  test("learned k-means IVF: recall@nprobe=4 beats the label-cell baseline") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val exact = SparkEntry.queries("q29_cosine_knn")(spark, TestSpark.sf0001)
      .collect().filter(_.getLong(1) <= 3)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val labelCell = SparkEntry.queries("q34_ann_ivf")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val labelRecall = (exact intersect labelCell).size.toDouble / exact.size

    val cents = Ann.kmeansCentroids(emb, k = 16, iters = 5)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    def recallAt(nprobe: Int): Double = {
      val got = Ann.ivfSearch(emb, col("vec_id") < 5, k = 3, cents, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    info(f"kmeans-IVF recall vs exact top-3: nprobe=1 $r1%.2f, nprobe=4 $r4%.2f " +
      f"(label-cell baseline $labelRecall%.2f)")
    assert(r4 >= r1, "more probes must not lose recall")
    assert(r4 >= labelRecall,
      f"learned cells at nprobe=4 ($r4%.2f) must match/beat the label-cell baseline ($labelRecall%.2f)")
  }

  test("baked q63 centroids reproduce from a fresh fit on the gate corpus") {
    // AnnCentroids.fitted is the quantizer trained once on sf0.01
    // (k=8, iters=5) and shipped as constants to the q63 gate AND its
    // DuckDB twin. If the corpus is ever regenerated, the gate would
    // still pass (both engines share the literals) while the quantizer
    // silently stopped matching the data — this refit catches that
    // loudly. Regenerate with: runMain graft.tools.FitCentroids
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val emb = graft.Tables.embeddings(spark, TestSpark.sf001)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val refit = Ann.kmeansCentroids(emb, k = 8, iters = 5)
    assert(refit.length == AnnCentroids.fitted.length)
    // 1e-6 tolerance: a regenerated corpus moves centroids by ~1e-2,
    // while avg() merge-order float noise across environments stays
    // many orders below this — the test must catch the former without
    // flaking on the latter
    refit.zip(AnnCentroids.fitted).zipWithIndex.foreach { case ((a, b), i) =>
      val maxDiff = a.zip(b).map { case (x, y) => math.abs(x - y) }.max
      assert(maxDiff < 1e-6,
        s"centroid $i drifted (max |Δ| = $maxDiff) — corpus changed? re-run FitCentroids")
    }
  }

  test("kmeans assignment is deterministic and covers all points") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val c1 = Ann.kmeansCentroids(emb, k = 8, iters = 3)
    val c2 = Ann.kmeansCentroids(emb, k = 8, iters = 3)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "deterministic fit")
    val cells = emb.withColumn("cell", Ann.cellCol(col("v"), c1))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getLong(1)).sum == 500, "every vector lands in a cell")
    assert(cells.length > 1, "quantizer actually partitions the space")
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

  test("q131 label cohesion equals the naive driver-side replay") {
    val rows = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .selectExpr("label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getSeq[Double](1).toArray))
    val byLabel = rows.groupBy(_._1)
    val naive = byLabel.map { case (l, vs) =>
      val dim = vs.head._2.length
      val c = Array.tabulate(dim)(j => vs.map(_._2(j)).sum / vs.length)
      val d2s = vs.map { case (_, v) =>
        BigDecimal(v.indices.foldLeft(0.0)((a, j) =>
          a + (v(j) - c(j)) * (v(j) - c(j))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) }
      val avg = BigDecimal((d2s.sum / d2s.length).toDouble)
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      l -> (vs.length.toLong, avg)
    }
    val got = graft.SparkEntry.queries("q131_label_cohesion")(spark, TestSpark.sf0001)
      .collect().map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == naive.keySet)
    naive.foreach { case (l, (n, avg)) =>
      assert(got(l)._1 == n)
      assert(math.abs(got(l)._2 - avg) < 2e-5, s"label $l: ${got(l)._2} vs $avg")
    }
  }
}
