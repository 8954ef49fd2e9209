package graft.ops

import graft.{Tables, TestSpark}
import graft.functions.Vectors
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Random-hyperplane LSH: determinism, bucket balance, and measured
  * recall vs exact brute force on the embedding corpus. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  test("plane components are deterministic ±1") {
    val a = Seq.tabulate(4, 8)((p, j) => Ann.planeComponent(42L, p, j))
    val b = Seq.tabulate(4, 8)((p, j) => Ann.planeComponent(42L, p, j))
    assert(a == b)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(a.flatten.toSet.size == 2, "both signs occur")
  }

  test("buckets are reasonably balanced (4 bits -> 16 buckets over 500 vecs)") {
    val counts = embeddings
      .withColumn("bucket", Ann.bucketCol(col("v"), dim = 64, nBits = 4))
      .groupBy("bucket").count().collect().map(_.getLong(1))
    assert(counts.length > 8, "most buckets populated")
    assert(counts.max < 500 / 2, "no degenerate mega-bucket")
  }

  test("LSH recall vs brute force is measured; same-bucket candidates rank correctly") {
    val k = 10
    val exactW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val e = embeddings.withColumn("nrm", Vectors.norm2(col("v")))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(exactW)).where(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Ann.search(embeddings, col("vec_id") < 20, k, dim = 64, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lshMp = Ann.search(embeddings, col("vec_id") < 20, k, dim = 64, nBits = 4,
        multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    val recall = (exact intersect lsh).size.toDouble / exact.size
    val recallMp = (exact intersect lshMp).size.toDouble / exact.size
    info(f"LSH(4-bit) recall@$k vs exact: single-probe $recall%.2f, multi-probe $recallMp%.2f")
    assert(recall > 0.05, "LSH must recover some true neighbors")
    assert(recallMp >= recall, "multi-probe must not lose recall")
    assert(recallMp > 0.3, "flipping each bit should recover most 1-plane misses")
    assert(lsh.nonEmpty && lsh.size <= 20L * k)
  }

  test("centroid drift audit: populations conserve, report covers every cell") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf0001)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val n = emb.count()
    val rows = Ann.centroidDrift(emb, AnnCentroids.fitted).collect()
    assert(rows.length == AnnCentroids.fitted.length, "one row per cell")
    // both assignments partition the SAME corpus
    assert(rows.map(_.getLong(1)).sum == n, "n_old sums to corpus")
    assert(rows.map(_.getLong(2)).sum == n, "n_new sums to corpus")
    rows.foreach { r =>
      val (nOld, moved, bp) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(moved <= nOld, "cannot move out more than were assigned")
      assert(bp >= 0 && bp <= 10000, s"shift_bp in basis-point range, got $bp")
      assert(r.getDouble(5) >= 0.0, "squared displacement is non-negative")
    }
    // one warm-start iteration from a 5-iteration fit must be a small
    // correction, not a re-shuffle of the index
    val totalMoved = rows.map(_.getLong(3)).sum
    assert(totalMoved.toDouble / n < 0.5,
      s"warm-start refinement moved $totalMoved of $n vectors")
  }
}
