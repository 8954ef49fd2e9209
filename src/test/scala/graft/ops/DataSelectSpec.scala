package graft.ops

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-selection family semantics beyond the value-level oracle:
  * BPE's greedy leftmost-non-overlapping merge (the run-parity window
  * arithmetic), merged symbols feeding later rounds, SemDeDup's
  * keeper attribution, and DSIR's target-lift property. */
class DataSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("BPE merge is greedy leftmost non-overlapping through a chain") {
    import spark.implicits._
    // "a a a a a": four (a,a) pairs, one run — merges at offsets 0 and 2
    // only, never the overlapping middle pair: aa aa a = 3 tokens.
    val docs = Seq((1L, "a a a a a")).toDF("doc_id", "text")
    val r = DataSelect.bpeTrain(docs, rounds = 1).collect()
    assert(r.length == 1)
    assert((r(0).getString(1), r(0).getString(2)) == ("a", "a"))
    assert(r(0).getLong(3) == 4, "pair count sees all four adjacencies")
    assert(r(0).getLong(4) == 3, "chain of 5 collapses to aa aa a")
  }

  test("BPE merged symbol participates in the next round's statistics") {
    import spark.implicits._
    // round 1 merges (x,y) (count tie with (y,z), t1-asc tiebreak);
    // round 2 must then merge the LEARNED symbol: (xy,z).
    val docs = Seq((1L, "x y z x y z")).toDF("doc_id", "text")
    val r = DataSelect.bpeTrain(docs, rounds = 2).collect()
      .sortBy(_.getInt(0))
    assert((r(0).getString(1), r(0).getString(2)) == ("x", "y"))
    assert((r(1).getString(1), r(1).getString(2)) == ("xy", "z"))
    assert(r(1).getLong(4) == 2, "corpus ends as two xyz super-tokens")
  }

  test("semdedup drops exactly the injected re-crawl slices with their originals as keepers") {
    val rows = SparkEntry.queries("q328_semdedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, keeper) = (r.getLong(0), r.getLong(1))
      assert(id >= 200000L, s"natural corpus pair above tau: $id")
      val orig = if (id >= 300000L) id - 300000L else id - 200000L
      assert(keeper == orig, s"dropped $id must keep its original $orig")
    }
    // both slices present: exact dups (cos 1.0) and perturbed (cos < 1)
    assert(rows.exists(_.getLong(0) >= 300000L), "perturbed slice caught")
    assert(rows.exists(r => r.getLong(0) >= 200000L && r.getLong(0) < 300000L))
    assert(rows.filter(_.getLong(0) < 300000L).forall(_.getDouble(3) == 1.0))
    assert(rows.filter(_.getLong(0) >= 300000L).forall(_.getDouble(3) < 1.0))
  }

  test("semdedup collapses a mass-duplicate vector group before the pair join") {
    import spark.implicits._
    // 2000 byte-identical vectors + 1 distinct: the exact-collapse
    // phase must shrink the pair join to TWO representative rows (the
    // old all-pairs formulation would build 2M within-cell pairs), and
    // the expansion must still attribute every copy to the lowest id.
    val dim = AnnCentroids.fitted.head.length
    val hot = Array.fill(dim)(0.1)
    val cold = Array.tabulate(dim)(i => if (i % 2 == 0) 0.1 else -0.1)
    val emb = ((0L until 2000L).map(i => (i, hot)) :+ (5000L, cold))
      .toDF("vec_id", "v")
    val out = DataSelect.semDedup(emb, AnnCentroids.fitted, tau = 0.95).collect()
    assert(out.length == 1999, "every copy but the representative drops")
    assert(out.forall(_.getLong(1) == 0L), "keeper is the lowest id")
    assert(out.forall(_.getDouble(3) == 1.0))
    assert(!out.exists(_.getLong(0) == 5000L), "the distinct vector survives")
  }

  test("streamed dsir scoring equals the batch weights bit-for-bit") {
    // the DECIMAL fold (stream) and the DECIMAL shuffle-sum (batch)
    // must agree exactly — the summation-order-independence claim
    val docs = graft.Tables.documents(spark, sf)
    val batch = DataSelect.dsirWeights(docs, col("lang") === "en", 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val streamed = SparkEntry.queries("q331_stream_dsir")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
  }

  test("shuffle shards partition the corpus into full fixed-size slices") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val out = SparkEntry.queries("q332_shuffle_shards")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(out.map(_.getLong(1)).sum == nDocs, "every doc lands exactly once")
    assert(out.init.forall(_.getLong(1) == 100), "all but the tail shard are full")
    assert(out.map(_.getLong(0)).toSeq == (0L until out.length).toSeq)
  }

  test("bpe compression only ever shrinks the token stream") {
    val out = SparkEntry.queries("q333_bpe_compression")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "merges cannot add tokens")
      assert(r.getLong(3) > 0 && r.getLong(3) <= 10000)
    }
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "three merges must fire somewhere in the corpus")
  }

  test("dsir weights lift the target language above the rest") {
    val docs = graft.Tables.documents(spark, TestSpark.sf001)
    val w = DataSelect.dsirWeights(docs, col("lang") === "en", 128)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("w").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false) + 0.5,
      s"mean importance weight of target docs must dominate: $w")
  }
}
