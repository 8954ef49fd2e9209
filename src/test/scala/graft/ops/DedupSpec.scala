package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-family quality guarantees beyond the value-level oracle: the
  * corpus plants near-dups at jaccard ≈ 0.99; banding theory puts a
  * (1−(1−j²)²) ≈ 0.998 collision floor on them, and SimHash must place
  * them within a small Hamming ball. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val nearDups = SparkEntry.queries("q27_ngram_jaccard")(spark, sf)
    .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))

  test("corpus contains planted near-dups and q27 finds them") {
    assert(nearDups.nonEmpty, "expected near-dup pairs in the corpus")
    assert(nearDups.exists(_._2 >= 0.9), "expected high-jaccard planted dups")
  }

  test("LSH candidates recall >= 80% of jaccard >= 0.9 pairs") {
    val high = nearDups.filter(_._2 >= 0.9).map(_._1).toSet
    val candidates = SparkEntry.queries("q26_lsh_candidates")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (high intersect candidates).size.toDouble / high.size
    info(f"LSH recall on j>=0.9 pairs: $recall%.2f (${high.size} pairs)")
    assert(recall >= 0.8, s"banding should catch near-identical docs, got $recall")
  }

  test("exact dedup keeps the minimum doc_id per fingerprint") {
    val rows = SparkEntry.queries("q24_dedup_exact")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == 500, "copies must account for all docs")
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("simhash of near-identical docs lands in a small Hamming ball") {
    val sketches = SparkEntry.queries("q28_simhash")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val high = nearDups.filter(_._2 >= 0.95).map(_._1)
    assert(high.nonEmpty)
    val dists = high.map { case (a, b) =>
      java.lang.Long.bitCount(sketches(a) ^ sketches(b))
    }
    info(s"simhash hamming distances on j>=0.95 pairs: ${dists.toSeq.sorted.mkString(",")}")
    assert(dists.forall(_ <= 8), s"expected <=8/32 differing bits, got ${dists.max}")
  }
}
