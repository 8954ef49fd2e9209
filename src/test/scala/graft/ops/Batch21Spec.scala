package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-checks for q316/q317 at sf0.001: each streamed gate must equal
  * its batch twin row-for-row, including q317's null-padded unmatched
  * rows (the watermark-expiry emissions).
  */
class Batch21Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q316 streamed OHLC equals the batch q315 bars") {
    val streamed = SparkEntry.queries("q316_stream_ohlc")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q315_ohlc")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("q317 streamed outer join equals the batch LEFT JOIN inside the horizon") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val maxTs = ev.map(_._2).max
    val clicks = ev.filter(e => e._3 == "click" && e._2 <= maxTs - 3600000000L)
    val purchases = ev.filter(_._3 == "purchase")
    val want = clicks.toSeq.flatMap { c =>
      val ms = purchases.filter(p => p._1 == c._1 && p._2 >= c._2 &&
        p._2 <= c._2 + 1800000000L).toSeq
      if (ms.isEmpty)
        Seq((c._1, c._2, None: Option[Long], None: Option[Double]))
      else ms.map(p => (c._1, c._2,
        Some(p._2): Option[Long], Some(p._4): Option[Double]))
    }.sortBy(t => (t._1, t._2, t._3.getOrElse(Long.MinValue)))
    val got = SparkEntry.queries("q317_stream_outer_join")(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
            (r.getTimestamp(1).getNanos / 1000) % 1000,
          if (r.isNullAt(2)) None
          else Some(r.getTimestamp(2).getTime * 1000 +
            (r.getTimestamp(2).getNanos / 1000) % 1000),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }.sortBy(t => (t._1, t._2, t._3.getOrElse(Long.MinValue))).toSeq
    assert(got.length == want.length)
    assert(got == want.toSeq)
    // the gate's point: unmatched clicks DID emit with nulls
    assert(got.exists(_._3.isEmpty), "expected null-padded unmatched rows")
  }
}
