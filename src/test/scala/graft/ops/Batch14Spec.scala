package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q301/q302 at sf0.001. */
class Batch14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q301 matches an exact set-based reference over every column pair") {
    def vals(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.get(0)).filter(_ != null).map(_.toString).toSet
    val sets = Map(
      "customer.c_mktsegment" -> vals(Tables.customer(spark, sf).select("c_mktsegment")),
      "orders.o_orderstatus" -> vals(Tables.orders(spark, sf).select("o_orderstatus")),
      "orders.o_orderpriority" -> vals(Tables.orders(spark, sf).select("o_orderpriority")),
      "lineitem.l_returnflag" -> vals(Tables.lineitem(spark, sf).select("l_returnflag")),
      "lineitem.l_linestatus" -> vals(Tables.lineitem(spark, sf).select("l_linestatus")),
      "part.p_brand" -> vals(Tables.part(spark, sf).select("p_brand")),
      "part.p_type" -> vals(Tables.part(spark, sf).select("p_type")),
      "documents.lang" -> vals(Tables.documents(spark, sf).select("lang")),
      "documents.source" -> vals(Tables.documents(spark, sf).select("source")),
      "events.event_type" -> vals(Tables.events(spark, sf).select("event_type")))
    val names = sets.keys.toSeq.sorted
    val want = (for {
      i <- names.indices; j <- i + 1 until names.length
      inter = (sets(names(i)) & sets(names(j))).size if inter > 0
    } yield {
      val un = sets(names(i)).size + sets(names(j)).size - inter
      (names(i), names(j), inter.toLong,
        BigDecimal.valueOf(inter.toDouble / un)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q301_schema_match")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("q302 gain chart matches a sort-based reference and is a valid distribution") {
    val rows = SparkEntry.queries("q302_gain_chart")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.last._4 - 1.0) < 1e-6, "cumulative capture ends at 1")
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq,
      "cumulative capture is monotone")
    // reference: decile membership recomputed driver-side
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), year(col("l_shipdate")).as("y"),
        col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), if (r.getInt(1) < 1998) "a" else "b",
        math.round(r.getDouble(2) * 100)))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val perCust = li.groupBy(e => (ord(e._1), e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val custs = perCust.keys.filter(_._2 == "a").map(_._1).toSeq
    val scored = custs.map(ck =>
        (ck, perCust((ck, "a")), perCust.getOrElse((ck, "b"), 0L)))
      .sortBy(t => (-t._2, t._1))
    val n = scored.length
    val wantN = (0 until n).groupBy(i => i.toLong * 10 / n).view
      .mapValues(_.length.toLong).toMap
    for ((dec, nc, _, _) <- rows)
      assert(nc == wantN(dec - 1), s"decile $dec count")
  }
}
