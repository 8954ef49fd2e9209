package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the driver contract: entry>0 rows; every declared query
  * executes at sf0.001 and (where non-degenerate there) returns rows.
  * Value-level correctness is the DuckDB oracle gate (tools/compare.py
  * replays it locally at sf0.01). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.columns.nonEmpty)
      df.count() // must not throw
    }
  }
}
