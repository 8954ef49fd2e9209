package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_sorted_inter must equal size(array_intersect(a, b)) for
  * sorted, duplicate-free bigint arrays — the producer invariant at
  * every call site (q198 builds rank arrays with
  * sort_array(collect_list) over distinct tokens). */
class SortedInterCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(198)
    val rows = (1 to 500).map { _ =>
      def arr() = rnd.shuffle((0L until 200L).toList)
        .take(rnd.nextInt(60)).sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      SortedInterCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("composed"))
    assert(got.where(col("native") =!= col("composed")).count() === 0L)
  }

  test("edges: empty, disjoint, identical, containment") {
    val df = Seq(
      (Seq.empty[Long], Seq.empty[Long], 0L),
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(2L, 3L), Seq(1L, 2L, 3L, 4L), 2L),
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue), 2L)
    ).toDF("a", "b", "want")
    assert(df.where(
      SortedInterCount(col("a"), col("b")) =!= col("want")).count() === 0L)
  }

  test("null array yields null") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
    assert(df.select(SortedInterCount(col("a"), col("b")).as("c"))
      .where(col("c").isNotNull).count() === 0L)
  }

  test("callable from SQL text via the injected function") {
    val got = spark.sql(
      "SELECT graft_sorted_inter(array(1L,2L,5L), array(2L,5L,9L)) AS c")
      .head().getLong(0)
    assert(got === 2L)
  }
}
