package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q307/q308 at sf0.001. */
class Batch17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q307 retention triangle matches a set-based reference exactly") {
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 604800000000L)).distinct
    val cohort = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val want = pairs.map(p => (cohort(p._1), p._2 - cohort(p._1), p._1))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((c0, off), es) =>
        val na = es.map(_._3).distinct.length.toLong
        (c0, off, na, sizes(c0), na.toDouble / sizes(c0))
      }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q307_retention_triangle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got.length == want.length)
    for (((wc, wo, wn, ws, wr), (gc, go, gn, gs, gr)) <- want.zip(got)) {
      assert(gc == wc && go == wo && gn == wn && gs == ws)
      assert(math.abs(gr - wr) < 1e-6)
    }
    // offset 0 retention is 1.0 by construction (everyone is active in
    // their own cohort week)
    for ((_, off, _, _, r) <- want if off == 0L) assert(r == 1.0)
  }

  test("q308 median CI matches a sort-based reference and brackets the median") {
    val perOrder = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.map(_._2).sorted
    val n = perOrder.length.toLong
    val z = 1.959964
    val lo = math.max(1L,
      math.floor((n - z * math.sqrt(n.toDouble)) / 2.0).toLong)
    val hi = math.min(n,
      math.ceil(1.0 + (n + z * math.sqrt(n.toDouble)) / 2.0).toLong)
    val md = (n + 1) / 2
    val got = SparkEntry.queries("q308_median_ci")(spark, sf)
      .collect().head
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(1) - perOrder((md - 1).toInt) / 100.0) < 0.005)
    assert(math.abs(got.getDouble(2) - perOrder((lo - 1).toInt) / 100.0) < 0.005)
    assert(math.abs(got.getDouble(3) - perOrder((hi - 1).toInt) / 100.0) < 0.005)
    assert(got.getLong(4) == lo && got.getLong(5) == hi)
    assert(got.getDouble(2) <= got.getDouble(1) &&
      got.getDouble(1) <= got.getDouble(3))
  }
}
