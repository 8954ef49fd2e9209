package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q311/q312 at sf0.001. */
class Batch19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q311 distinct rollup matches a set-based reference at every level") {
    def lng(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val custNation = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (lng(r, 0), lng(r, 1))).toMap
    val nation = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => (lng(r, 0), (r.getString(1), lng(r, 2)))).toMap
    val region = Tables.region(spark, sf)
      .select(col("r_regionkey"), col("r_name")).collect()
      .map(r => (lng(r, 0), r.getString(1))).toMap
    val triples = Tables.orders(spark, sf).select(col("o_custkey"))
      .collect().map(_.getLong(0)).distinct
      .map { ck =>
        val (nn, rk) = nation(custNation(ck))
        (region(rk), nn, ck)
      }
    val leaf = triples.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).distinct.length.toLong).toMap
    val reg = triples.groupBy(_._1).view
      .mapValues(_.map(_._3).distinct.length.toLong).toMap
    val grand = triples.map(_._3).distinct.length.toLong
    val got = SparkEntry.queries("q311_distinct_rollup")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for (((rn, nn), c) <- leaf) assert(got((rn, nn)) == c)
    for ((rn, c) <- reg) assert(got((rn, "(all)")) == c)
    assert(got(("(all)", "(all)")) == grand)
    assert(got.size == leaf.size + reg.size + 1)
    // distinct counts must NOT be additive-rolled (a customer has one
    // nation here, so region = sum of its nations — but the grand
    // total equals the distinct customer base, not a double count)
    assert(grand == triples.map(_._3).distinct.length.toLong)
  }

  test("q312 conditional quantiles match the rank-ceil reference per bin") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_discount"), col("l_quantity")).collect()
      .map(r => (math.round(r.getDouble(0) * 100).toInt, r.getDouble(1)))
    val byBin = rows.groupBy(_._1)
    val got = SparkEntry.queries("q312_conditional_quantiles")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == byBin.keySet)
    for ((bin, es) <- byBin) {
      val vs = es.map(_._2).sorted
      val n = vs.length
      def kth(p: Double) = vs(math.max(1, math.ceil(p * n).toLong).toInt - 1)
      val (gn, g50, g90) = got(bin)
      assert(gn == n.toLong)
      assert(g50 == kth(0.5), s"bin $bin p50")
      assert(g90 == kth(0.9), s"bin $bin p90")
    }
  }
}
