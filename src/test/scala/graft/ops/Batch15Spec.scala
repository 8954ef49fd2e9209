package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q303/q304 at sf0.001. */
class Batch15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private val touch = Set("view", "click", "signup")

  private def events: Array[(Long, String, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("q303 three attribution models match a per-journey reference") {
    val byUser = events.groupBy(_._1)
    val types = Seq("click", "signup", "view")
    var nFirst = Map.empty[String, Long].withDefaultValue(0L)
    var nLast = Map.empty[String, Long].withDefaultValue(0L)
    var lin = Map.empty[String, BigDecimal].withDefaultValue(BigDecimal(0))
    var nPurch = 0L
    for ((_, es) <- byUser; p <- es if p._2 == "purchase") {
      val frame = es.filter(e =>
        touch(e._2) && e._3 >= p._3 - 86400000000L && e._3 <= p._3 - 1)
      if (frame.nonEmpty) {
        nPurch += 1
        val sorted = frame.sortBy(e => (e._3, e._4))
        nFirst += sorted.head._2 -> (nFirst(sorted.head._2) + 1)
        nLast += sorted.last._2 -> (nLast(sorted.last._2) + 1)
        for (t <- types) {
          val c = frame.count(_._2 == t)
          lin += t -> (lin(t) + BigDecimal.valueOf(c.toDouble / frame.length)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        }
      }
    }
    val got = SparkEntry.queries("q303_attribution_models")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == types.toSet)
    for (t <- types) {
      val (gf, gl, glin, gn) = got(t)
      assert(gf == nFirst(t), s"$t first")
      assert(gl == nLast(t), s"$t last")
      assert(math.abs(glin - lin(t).toDouble) < 1e-6, s"$t linear")
      assert(gn == nPurch)
    }
    // conservation: every model distributes exactly n_purch credits
    assert(types.map(nFirst).sum == nPurch)
    assert(types.map(nLast).sum == nPurch)
    assert((types.map(lin).sum - BigDecimal(nPurch)).abs < BigDecimal(1e-5))
  }

  test("q304 bounce/entry-exit matches a driver-side sessionizer") {
    val sessions = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4))
      val buf = scala.collection.mutable.ListBuffer.empty[List[(Long, String, Long, Long)]]
      var cur = List.empty[(Long, String, Long, Long)]
      var prev = Long.MinValue
      for (e <- sorted) {
        if (cur.isEmpty || e._3 - prev > 1800000000L) {
          if (cur.nonEmpty) buf += cur.reverse
          cur = List(e)
        } else cur = e :: cur
        prev = e._3
      }
      if (cur.nonEmpty) buf += cur.reverse
      buf.toList
    }.toSeq
    val byEntry = sessions.groupBy(_.head._2)
    val got = SparkEntry.queries("q304_session_bounce")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == byEntry.keySet)
    for ((t, ss) <- byEntry) {
      val (gn, gb, gm, gsame) = got(t)
      assert(gn == ss.length.toLong)
      assert(math.abs(gb - ss.count(_.length == 1).toDouble / ss.length) < 1e-6)
      assert(math.abs(gm - ss.map(_.length).sum.toDouble / ss.length) < 1e-6)
      assert(gsame == ss.count(s0 => s0.head._2 == s0.last._2).toLong)
    }
  }
}
