package graft.ops

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB substitutes for exact distinct
  * counts and percentiles (HLL++ and KLL-style sketches: bounded memory,
  * one pass, mergeable across partitions). No DuckDB oracle is possible
  * (different sketch algorithms), so accuracy is spec'd against exact
  * values with the algorithms' published error bounds. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sf)
    val approxMedian = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))).head().getDouble(0)
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.02)
  }

  test("sketches merge across repartitionings (mergeability = scale contract)") {
    val li = Tables.lineitem(spark, sf)
    val a = li.agg(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    val b = li.repartition(13).agg(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    assert(a == b, "HLL result must not depend on partitioning")
  }
}
