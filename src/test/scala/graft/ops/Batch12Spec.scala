package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q297/q298 at sf0.001. */
class Batch12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q297 trailing-window distinct matches a set-based reference exactly") {
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000L)).distinct
    val days = pairs.map(_._2).distinct.sorted
    val want = days.map { d =>
      val u1 = pairs.filter(_._2 == d).map(_._1).distinct.length.toLong
      val u7 = pairs.filter(p => p._2 >= d - 6 && p._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, u1, u7)
    }
    val got = SparkEntry.queries("q297_sliding_distinct")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want.toSeq)
  }

  test("q298 modified z-scores match a sort-based reference") {
    val daily = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("timestamp"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L / 86400000000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = daily.length
    val vs = daily.map(_._2).sorted
    val med = vs((n + 1) / 2 - 1)
    val devs = daily.map(e => math.abs(e._2 - med)).sorted
    val mad = devs((n + 1) / 2 - 1)
    val want = daily.flatMap { case (d, v) =>
      val z = BigDecimal.valueOf(0.6745 * (v - med).toDouble / mad)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (math.abs(z) > 3.5) Some((d, v / 100.0, z)) else None
    }.sortBy(_._1)
    val got = SparkEntry.queries("q298_daily_anomaly")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == want.length)
    for (((wd, wr, wz), (gd, gr, gz)) <- want.zip(got)) {
      assert(gd == wd)
      assert(math.abs(gr - wr) < 0.005)
      assert(math.abs(gz - wz) < 1e-6)
    }
  }
}
