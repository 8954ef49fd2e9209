package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-checks for q295/q296: the streamed Benford monitor must equal
  * the batch histogram exactly, and the price/volume/mix decomposition
  * must satisfy its defining sum identity per segment.
  */
class Batch11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q295 streamed digit histogram equals the batch q285 histogram") {
    val streamed = SparkEntry.queries("q295_stream_benford")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val batch = SparkEntry.queries("q285_benford")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("q296 effects sum to the revenue delta per segment (the defining identity)") {
    // identity on the UNROUNDED decomposition, recomputed from raw data:
    // price + volume + mix = rev_b - rev_a exactly (real arithmetic);
    // the gate's round@2 cells are each within half a cent of these
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .select(col("p_partkey").as("l_partkey"), col("p_type")), "l_partkey")
      .select(col("p_type"), year(col("l_shipdate")).as("y"),
        col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), if (r.getInt(1) < 1998) "a" else "b",
        math.round(r.getDouble(2) * 100), math.round(r.getDouble(3))))
    val cells = li.groupBy(e => (e._1, e._2)).view
      .mapValues(es => (es.map(_._3).sum, es.map(_._4).sum)).toMap
    val types = li.map(_._1).distinct.sorted
    val va = types.map(t => cells((t, "a"))._2).sum.toDouble
    val vb = types.map(t => cells((t, "b"))._2).sum.toDouble
    val g = vb / va
    val got = SparkEntry.queries("q296_price_volume_mix")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got.keySet == types.toSet)
    for (t <- types) {
      val (rcA, vA) = cells((t, "a")); val (rcB, vB) = cells((t, "b"))
      val pa = rcA.toDouble / vA; val pb = rcB.toDouble / vB
      val price = (pb - pa) * vB / 100
      val volume = pa * vA * (g - 1) / 100
      val mix = pa * (vB - vA * g) / 100
      val (gRevA, gRevB, gPrice, gVolume, gMix) = got(t)
      assert(math.abs(gRevA - rcA / 100.0) < 0.005)
      assert(math.abs(gRevB - rcB / 100.0) < 0.005)
      assert(math.abs(gPrice - price) < 0.005)
      assert(math.abs(gVolume - volume) < 0.005)
      assert(math.abs(gMix - mix) < 0.005)
      // the defining identity, unrounded
      assert(math.abs((price + volume + mix) - (rcB - rcA) / 100.0) < 1e-6)
    }
  }
}
