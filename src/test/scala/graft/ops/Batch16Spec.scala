package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q305/q306 at sf0.001. */
class Batch16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def events: Array[(Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q305 window funnel matches an exhaustive per-user reference") {
    val W = 3600000000L
    val byUser = events.groupBy(_._1)
    val want = byUser.map { case (_, es) =>
      val v = es.filter(_._2 == "view").map(_._3)
      val c = es.filter(_._2 == "click").map(_._3)
      val p = es.filter(_._2 == "purchase").map(_._3)
      val s3 = v.exists(tv => c.exists(tc => tc > tv && tc <= tv + W &&
        p.exists(tp => tp > tc && tp <= tv + W)))
      val s2 = v.exists(tv => c.exists(tc => tc > tv && tc <= tv + W))
      if (s3) 3 else if (s2) 2 else if (v.nonEmpty) 1 else 0
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q305_window_funnel")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q306 Wasserstein-1 matches an exact merged-support reference") {
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    def w1(ta: String, tb: String): Double = {
      val a = vals.filter(_._1 == ta).map(_._2).sorted
      val b = vals.filter(_._1 == tb).map(_._2).sorted
      val support = (a ++ b).distinct.sorted
      var num = BigInt(0)
      for (i <- 0 until support.length - 1) {
        val x = support(i)
        val cumA = a.count(_ <= x).toLong
        val cumB = b.count(_ <= x).toLong
        num += BigInt(cumA * b.length - cumB * a.length).abs *
          (support(i + 1) - x)
      }
      num.toDouble / a.length / b.length / 100
    }
    val got = SparkEntry.queries("q306_wasserstein")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    for (((ta, tb), gw) <- got)
      assert(math.abs(gw - w1(ta, tb)) < 1e-6, s"($ta,$tb): $gw vs ${w1(ta, tb)}")
    // metric sanity: W1(x, x) = 0
    assert(w1("click", "click") == 0.0)
  }
}
