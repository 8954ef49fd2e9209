package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the q283–q288 batch at sf0.001 — an
  * INDEPENDENT driver-side reimplementation per gate (plain Scala over
  * collected rows), so the distributed forms are validated against
  * something other than the DuckDB oracle and at a different scale
  * factor than the driver gate.
  */
class Batch8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q283 PCA: unit-max loading, PSD bounds, and lam within the converged top eigenvalue") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = 8
    val n = vecs.length.toDouble
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    // plain full-precision covariance (no rounding — independent path)
    val c = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    // converged reference power iteration (500 rounds, no rounding)
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 500) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val lamRef = {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      (0 until d).map(i => v(i) * w(i)).sum
    }
    val trace = (0 until d).map(i => c(i)(i)).sum
    val rows = run("q283_pca_power").collect()
    assert(rows.length == d)
    val loadings = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val lam = rows.head.getDouble(2)
    val share = rows.head.getDouble(3)
    // normalization contract: the max-|.| component is exactly +1
    assert(math.abs(loadings.map(math.abs).max - 1.0) < 1e-9)
    assert(loadings.max == 1.0, "sign convention: dominant component positive")
    // Rayleigh quotient of ANY vector is <= the top eigenvalue, and the
    // 8 rounds must have climbed above the best coordinate axis
    assert(lam <= lamRef + 1e-6, s"lam=$lam above converged top eig $lamRef")
    assert(lam >= (0 until d).map(i => c(i)(i)).max - 1e-6,
      "top eigenvalue of a PSD matrix dominates every diagonal entry")
    assert(share > 0.0 && share <= 1.0 + 1e-9)
    assert(math.abs(share - lam / trace) < 1e-4)
    // NOT asserted here: direction match vs the converged reference.
    // sf0.001's random embeddings are near-isotropic (tiny eigengap),
    // where an 8-round iterate is an honest partial estimate by
    // construction — convergence is pinned on a planted spike below.
  }

  test("q283 power iteration converges on a planted dominant direction") {
    // spike covariance: strong rank-1 direction + small isotropic floor
    // — the collapsed-encoder case the audit exists to flag. Eigengap
    // is large, so 8 rounds must lock onto the planted eigenvector.
    val d = 8
    val dir = Array(0.6, -0.3, 0.45, 0.15, -0.5, 0.2, 0.1, -0.1)
    val nrm = math.sqrt(dir.map(x => x * x).sum)
    val u = dir.map(_ / nrm)
    val c = Array.tabulate(d, d) { (i, j) =>
      5.0 * u(i) * u(j) + (if (i == j) 0.01 else 0.0)
    }
    val (v, lam) = Similarity.powerIterate(c, 8)
    val cosang = math.abs((0 until d).map(i => v(i) * u(i)).sum) /
      math.sqrt(v.map(x => x * x).sum)
    assert(cosang > 0.9999, s"planted direction not recovered: $cosang")
    assert(math.abs(lam - 5.01) < 1e-3, s"planted eigenvalue missed: $lam")
    // determinism: the rounded iteration is bit-reproducible
    val (v2, lam2) = Similarity.powerIterate(c, 8)
    assert(v.sameElements(v2) && lam == lam2)
  }

  test("q284 co-purchase recs match a driver-side reference exactly") {
    val b = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val np = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nab = b.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
    val sym = nab.toSeq.flatMap { case ((a, bb), c) =>
      Seq((a, bb, c), (bb, a, c)) }
    val want = sym.map { case (a, rec, c) =>
      (a, rec, r6(c.toDouble / math.sqrt(np(a).toDouble * np(rec).toDouble)))
    }.groupBy(_._1).toSeq.flatMap { case (a, es) =>
      es.sortBy(e => (-e._3, e._2)).take(3).zipWithIndex
        .map { case ((_, rec, cos), i) => (a, (i + 1).toLong, rec, cos) }
    }.sortBy(t => (t._1, t._2))
    val got = run("q284_copurchase_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == want)
  }

  test("q285 Benford digits and chi-square terms match a reference") {
    val digits = Tables.orders(spark, sf).select(col("o_totalprice"))
      .collect().map { r =>
        val cents = math.round(r.getDouble(0) * 100)
        cents.toString.head.asDigit
      }
    val n = digits.length.toDouble
    val hist = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = run("q285_benford").collect()
    assert(got.map(_.getLong(1)).sum == digits.length)
    for (r <- got) {
      val d = r.getInt(0)
      assert(r.getLong(1) == hist(d))
      val p = BigDecimal.valueOf(math.log10(1.0 + 1.0 / d))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expN = n * p
      assert(math.abs(r.getDouble(2) - hist(d) / n) < 1e-6)
      assert(math.abs(r.getDouble(4) -
        (hist(d) - expN) * (hist(d) - expN) / expN) < 1e-5)
    }
  }

  test("q286 Theil-Sen and OLS slopes match a sort-based reference") {
    val wkly = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("timestamp"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L / 604800000000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val slopes = (for {
      i <- wkly.indices; j <- i + 1 until wkly.length
    } yield (wkly(j)._2 - wkly(i)._2).toDouble /
        (wkly(j)._1 - wkly(i)._1).toDouble).sorted
    val nP = slopes.length
    val medRef = (slopes((nP + 1) / 2 - 1) + slopes(nP / 2)) / 2
    val n = wkly.length.toDouble
    val sx = wkly.map(_._1.toDouble).sum
    val sy = wkly.map(_._2.toDouble).sum
    val sxy = wkly.map(t => t._1.toDouble * t._2).sum
    val sxx = wkly.map(t => t._1.toDouble * t._1).sum
    val olsRef = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = run("q286_theil_sen").collect().head
    assert(got.getLong(0) == wkly.length)
    assert(got.getLong(1) == nP.toLong)
    assert(math.abs(got.getDouble(2) - medRef) < 1e-6)
    assert(math.abs(got.getDouble(3) - olsRef) < math.abs(olsRef) * 1e-6 + 1e-6)
  }

  test("q287 skew audit matches an exact driver-side reference") {
    val keys = Tables.lineitem(spark, sf).select(col("l_partkey"))
      .collect().map(_.getLong(0))
    val freq = keys.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val counts = freq.map(_._2).sorted
    val nk = counts.length.toLong
    val tot = counts.sum
    val mx = counts.max
    val p50 = counts(((nk + 1) / 2 - 1).toInt)
    val p99 = counts(((99 * nk + 99) / 100 - 1).toInt)
    val t10 = freq.sortBy(t => (-t._2, t._1)).take(10).map(_._2).sum
    val got = run("q287_skew_audit").collect().head
    assert(got.getLong(0) == nk)
    assert(got.getLong(1) == mx)
    assert(got.getLong(2) == p50)
    assert(got.getLong(3) == p99)
    assert(math.abs(got.getDouble(4) - mx.toDouble * nk / tot) < 1e-6)
    assert(math.abs(got.getDouble(5) - t10.toDouble / tot) < 1e-6)
  }

  test("q288 seasonal-naive backtest matches an exact reference") {
    val hourly = Tables.events(spark, sf)
      .select(col("ts"), col("value")).collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L / 3600000000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val evalHrs = hourly.keys.filter(h =>
      hourly.contains(h - 24) && hourly.contains(h - 1)).toSeq
    val se = evalHrs.map(h => math.abs(hourly(h) - hourly(h - 24))).sum
    val ne = evalHrs.map(h => math.abs(hourly(h) - hourly(h - 1))).sum
    val got = run("q288_seasonal_naive").collect().head
    assert(got.getLong(0) == evalHrs.length.toLong)
    assert(math.abs(got.getDouble(1) - se.toDouble / evalHrs.length / 100) < 1e-6)
    assert(math.abs(got.getDouble(2) - ne.toDouble / evalHrs.length / 100) < 1e-6)
    assert(math.abs(got.getDouble(3) - se.toDouble / ne) < 1e-6)
  }
}
