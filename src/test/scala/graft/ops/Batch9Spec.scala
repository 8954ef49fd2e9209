package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the q289–q292 batch at sf0.001 —
  * independent driver-side reimplementations (plain Scala over
  * collected rows), validating the distributed forms off-oracle and at
  * a different scale factor than the driver gate.
  */
class Batch9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def events: Array[(String, Long, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")), col("user_id"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))

  test("q289 lead-lag picks the max-correlation lag per ordered type pair") {
    val ser = events.groupBy(e => (e._1, e._2 / 3600000000L))
      .view.mapValues(_.map(_._4).sum).toMap
    val types = events.map(_._1).distinct.sorted
    val hours = ser.keys.map(_._2).toSeq
    def corr(ta: String, tb: String, lag: Long): Option[Double] = {
      val pts = hours.flatMap { h =>
        for (x <- ser.get((ta, h)); y <- ser.get((tb, h + lag)))
          yield (x.toDouble, y.toDouble)
      }
      if (pts.size < 2) None
      else {
        val n = pts.size.toDouble
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val syy = pts.map(p => p._2 * p._2).sum
        Some((n * sxy - sx * sy) /
          (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      }
    }
    val got = run("q289_lead_lag").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for (ta <- types; tb <- types if ta != tb) {
      val want = (0L to 6L).flatMap(l => corr(ta, tb, l).map(c =>
        (BigDecimal.valueOf(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, l)))
        .sortBy { case (c, l) => (-c, l) }.head
      val (gl, gc) = got((ta, tb))
      assert(gl == want._2, s"($ta,$tb): lag $gl vs ${want._2}")
      assert(math.abs(gc - want._1) < 2e-6, s"($ta,$tb): corr $gc vs ${want._1}")
    }
  }

  test("q290 conversion latency percentiles match a sort-based reference") {
    val byUser = events.groupBy(_._3)
    val lats = byUser.values.flatMap { es =>
      val views = es.filter(_._1 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val tv = views.min
        val ps = es.filter(e => e._1 == "purchase" && e._2 > tv).map(_._2)
        if (ps.isEmpty) None else Some(ps.min - tv)
      }
    }.toSeq.sorted
    val n = lats.size.toLong
    def k(q: Long) = ((q * n + 99) / 100).toInt
    val got = run("q290_time_to_convert").collect().head
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(1) - lats(k(25) - 1) / 1e6) < 1e-6)
    assert(math.abs(got.getDouble(2) - lats(k(50) - 1) / 1e6) < 1e-6)
    assert(math.abs(got.getDouble(3) - lats(k(90) - 1) / 1e6) < 1e-6)
  }

  test("q291 Haar energies match an exact reference and conserve total energy") {
    val hourly = events.groupBy(_._2 / 3600000000L)
      .view.mapValues(_.map(_._4).sum).toMap
    val h0 = hourly.keys.min
    var series = Array.tabulate(512)(i => BigInt(hourly.getOrElse(h0 + i, 0L)))
    val orig = series
    var want = List.empty[(Int, Long, BigInt)]
    var lvl = 1
    while (series.length > 1) {
      val n = series.length / 2
      val d = Array.tabulate(n)(i => series(2 * i) - series(2 * i + 1))
      want ::= ((lvl, n.toLong, d.map(x => x * x).sum))
      series = Array.tabulate(n)(i => series(2 * i) + series(2 * i + 1))
      lvl += 1
    }
    val got = run("q291_haar_energy").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == 9)
    for (((wl, wn, we), (gl, gn, ge)) <- want.reverse.zip(got)) {
      assert(gl == wl && gn == wn)
      assert(ge == we.toDouble, s"level $wl energy $ge vs $we")
    }
    // Parseval for unnormalized Haar: sum over levels of energy/2^level
    // + (global sum)^2/512 equals the input's raw energy
    val raw = orig.map(x => x * x).sum
    val recon = want.map { case (l, _, e) =>
      BigDecimal(e) / BigDecimal(BigInt(1) << l) }.sum +
      BigDecimal(orig.sum * orig.sum) / 512
    assert((recon - BigDecimal(raw)).abs < BigDecimal(1e-6))
  }

  test("q292 uplift screen matches an exact contingency reference") {
    val units = events.groupBy(e => (e._3, e._2 / 86400000000L))
    val cells = units.values.map { es =>
      (es.exists(_._1 == "error"), es.exists(_._1 == "purchase"))
    }
    val n1 = cells.count(_._1); val k1 = cells.count(c => c._1 && c._2)
    val n0 = cells.count(!_._1); val k0 = cells.count(c => !c._1 && c._2)
    val got = run("q292_uplift_screen").collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == k1)
    assert(got.getLong(2) == n0 && got.getLong(3) == k0)
    val p1 = k1.toDouble / n1; val p0 = k0.toDouble / n0
    val pp = (k1 + k0).toDouble / (n1 + n0)
    assert(math.abs(got.getDouble(6) - p1 / p0) < 1e-6)
    assert(math.abs(got.getDouble(7) -
      (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n0))) < 1e-6)
  }
}
