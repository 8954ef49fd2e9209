package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for q299/q300: the streamed compaction must equal the
  * batch compaction row-for-row, and percent-of-parent shares must sum
  * to 1 within each parent.
  */
class Batch13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q299 streamed latest-wins equals the batch q156 compaction") {
    val streamed = SparkEntry.queries("q299_stream_latest_wins")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q156_latest_wins")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("q300 shares sum to 1 within each region and across regions") {
    val rows = SparkEntry.queries("q300_pct_of_parent")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    val byRegion = rows.groupBy(_._1)
    for ((reg, es) <- byRegion) {
      val s = es.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$reg nation shares sum to $s")
    }
    val regShare = byRegion.view.mapValues(_.head._3).values.sum
    assert(math.abs(regShare - 1.0) < 1e-4,
      s"region shares sum to $regShare")
  }
}
