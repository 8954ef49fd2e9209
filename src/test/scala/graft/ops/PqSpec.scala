package graft.ops

import graft.{Tables, TestSpark}
import graft.functions.Vectors
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization: encoding determinism, quantization distortion
  * sanity, measured IVF-PQ recall vs exact brute force, and exactness
  * of the reranked output scores. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  test("PQ codes are deterministic and within [0, 16)") {
    val a = embeddings.select(col("vec_id"), Pq.codesCol(col("v")).as("c"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val b = embeddings.select(col("vec_id"), Pq.codesCol(col("v")).as("c"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(a.sameElements(b))
    assert(a.forall(_._2.length == 8), "one code per subspace")
    assert(a.forall(_._2.forall(c => c >= 0 && c < 16)))
    assert(a.flatMap(_._2).distinct.length > 8, "codebooks actually used")
  }

  test("quantization distortion is below the corpus scale (codebooks fit the data)") {
    // ADC of a vector against ITS OWN codes = the quantization error
    // sum_s d2(v_s, c_{code_s}); a fitted codebook must sit well below
    // the average exact distance between distinct vectors.
    val self = embeddings
      .select(Pq.adcDist(Pq.adcTabCol(col("v")), Pq.codesCol(col("v"))).as("q"))
      .agg(avg(col("q"))).first().getDouble(0)
    val a = embeddings.where(col("vec_id") < 50)
      .select(col("vec_id").as("ia"), col("v").as("va"))
    val b = embeddings.where(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id").as("ib"), col("v").as("vb"))
    val cross = a.join(b)
      .select(aggregate(zip_with(col("va"), col("vb"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x).as("d2"))
      .agg(avg(col("d2"))).first().getDouble(0)
    info(f"mean quantization distortion $self%.4f vs mean pairwise d2 $cross%.4f")
    assert(self > 0.0, "lossy by construction")
    assert(self < cross / 2, "distortion well under inter-vector distance")
  }

  test("IVF-PQ recall vs exact brute force; reranked scores are exact") {
    val k = 3
    val e = embeddings.withColumn("nrm", Vectors.norm2(col("v")))
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val exactW = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val exactAll = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val exact = exactAll
      .withColumn("rank", row_number().over(exactW)).where(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val pq = Pq.pqSearch(embeddings, col("vec_id") < 20, k,
      AnnCentroids.fitted, nprobe = 4, cand = 50, roundDp = 5).collect()
    val got = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"IVF-PQ recall@$k vs exact: $recall%.2f")
    assert(recall > 0.4, "coarse cells + 4-bit codes must recover a solid fraction")
    assert(got.size == 20 * k, "k results per query")

    // every reported cos equals the true cosine of that pair (rerank
    // is exact over full vectors; only the 5 dp round is approximate)
    val truth = exactAll.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pq.foreach { r =>
      val expect = math.round(truth((r.getLong(0), r.getLong(2))) * 1e5) / 1e5
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"rerank cos must be the exact cosine for ${(r.getLong(0), r.getLong(2))}")
    }
  }

  test("probed-cell candidates only: search joins on the IVF cell, no cross join") {
    val plan = Pq.pqSearch(embeddings, col("vec_id") < 5, 3,
      AnnCentroids.fitted).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "ADC must never scan all pairs")
  }
}
