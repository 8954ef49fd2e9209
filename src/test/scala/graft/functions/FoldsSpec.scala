package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Typed Aggregator folds: partitioning-invariance (merge correctness)
  * and sketch quality. */
class FoldsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("XorChecksum is partitioning-invariant and order-insensitive") {
    val data = (1L to 100000L).toVector
    val a = spark.createDataset(data).coalesce(1)
      .select(Folds.XorChecksum.toColumn).head()
    val b = spark.createDataset(scala.util.Random.shuffle(data)).repartition(13)
      .select(Folds.XorChecksum.toColumn).head()
    assert(a == b)
    assert(a != 0L)
  }

  test("MinHashSketch merge equals single-pass fold") {
    val agg = new Folds.MinHashSketch(8)
    val tokens = Seq("a", "b", "c", "d", "e", "f", "g")
    val single = tokens.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = tokens.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(single.toSeq == merged.toSeq)
  }

  test("MinHashSketch jaccard estimate tracks true jaccard") {
    val agg = new Folds.MinHashSketch(256)
    val a = (1 to 100).map(i => s"tok$i")
    val b = (21 to 120).map(i => s"tok$i") // true jaccard = 80/120 ≈ 0.667
    val sa = a.foldLeft(agg.zero)(agg.reduce)
    val sb = b.foldLeft(agg.zero)(agg.reduce)
    val est = agg.jaccard(sa, sb)
    info(f"estimated jaccard: $est%.3f (true 0.667)")
    assert(math.abs(est - 0.667) < 0.12)
  }

  test("MinHashSketch works distributed per group") {
    val agg = new Folds.MinHashSketch(16)
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .as[(Long, String)]
    val sketches = docs.groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
      .collect().toMap
    assert(sketches.size == 500)
    assert(sketches.values.forall(_.length == 16))
    // the sketch is a pure function of the token SET: docs with equal
    // sets must have identical sketches (similar-but-unequal sets MAY
    // collide — that is what makes it a similarity sketch)
    val setsById = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("set"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val bySet = setsById.groupBy(_._2).values
    bySet.foreach { group =>
      val ids = group.keys.toSeq
      assert(ids.map(id => sketches(id).toSeq).distinct.size == 1,
        s"equal token sets must sketch identically: $ids")
    }
    assert(sketches.values.map(_.toSeq).toSeq.distinct.size > 100)
  }
}
