package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q309/q310 at sf0.001. */
class Batch18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q309 EXISTS/set-op text twin matches a driver-side reference") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val byCust = orders.groupBy(_._1)
    val armA = cust.map(_._1).filter { ck =>
      byCust.get(ck).exists(os => os.exists(_._2 == "1-URGENT") &&
        !os.exists(_._3 == "F"))
    }.toSet
    val mean = cust.map(c => BigDecimal.valueOf(c._2)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / cust.length
    val armB = cust.filter(_._2 > mean).map(_._1).toSet
    val want = (armA & armB).toSeq.sorted
    val got = SparkEntry.queries("q309_sqltext_exists_setop")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("q310 run counts match a single-threaded sorted walk exactly") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("timestamp"), col("l_orderkey"),
        col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
        col("l_suppkey"), col("l_partkey"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))
    def runs[T](xs: Seq[T]): Long =
      1L + xs.zip(xs.drop(1)).count { case (a, b) => a != b }
    // extended total pre-order (duplicate (orderkey, linenumber) tuples
    // exist in the corpus; remaining ties are identical in every
    // audited column, so run counts are tie-invariant)
    val byShip = rows.sortBy(r => (r._1, r._2, r._3, r._7, r._6, r._4, r._5))
    val bySupp = rows.sortBy(r => (r._6, r._2, r._3, r._7, r._4, r._5))
    val want = Map(
      ("ship_date", "l_returnflag") -> runs(byShip.map(_._4).toSeq),
      ("ship_date", "l_linestatus") -> runs(byShip.map(_._5).toSeq),
      ("ship_date", "l_suppkey") -> runs(byShip.map(_._6).toSeq),
      ("supplier", "l_returnflag") -> runs(bySupp.map(_._4).toSeq),
      ("supplier", "l_linestatus") -> runs(bySupp.map(_._5).toSeq),
      ("supplier", "l_suppkey") -> runs(bySupp.map(_._6).toSeq))
    val got = SparkEntry.queries("q310_rle_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(got == want)
    // sorting BY supplier must give l_suppkey exactly |suppliers| runs
    assert(got(("supplier", "l_suppkey")) ==
      rows.map(_._6).distinct.length.toLong)
  }
}
