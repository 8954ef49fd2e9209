package graft.ops

import graft.{QueryDef, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Broadcast Bloom pre-join: the one-sided membership contract (never
  * a false negative), a measured false-positive rate against theory,
  * and value-equality of the gated query with the unfiltered join. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mBits = 1 << 16
  private lazy val members = (0L until 1000L).toDF("key")
  private lazy val bits = Scale.bloomBits(members, "key", mBits)

  test("no false negatives: every built key probes true") {
    val missed = members
      .where(!Scale.bloomMightContain(col("key"), bits, mBits))
      .count()
    assert(missed == 0L, "a Bloom filter must never reject a member")
  }

  test("false-positive rate is near the theoretical bound") {
    val probes = 20000L
    val fp = (100000L until 100000L + probes).toDF("key")
      .where(Scale.bloomMightContain(col("key"), bits, mBits))
      .count()
    val rate = fp.toDouble / probes
    // (1 - e^(-kn/m))^k with k=3, n=1000, m=65536 ≈ 9e-5
    info(f"false-positive rate $rate%.5f over $probes probes")
    assert(rate < 0.01, "orders of magnitude below a useful pre-filter bar")
  }

  test("no false negatives across random key sets and filter geometries") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 3) {
      val mBits = 64 << rnd.nextInt(5) // 64..1024 bits, deliberately tight
      val kHash = 1 + rnd.nextInt(4)
      val keys = Seq.fill(50)(rnd.nextLong() % 100000L).distinct
      val bits = Scale.bloomBits(keys.toDF("key"), "key", mBits, kHash)
      val missed = keys.toDF("key")
        .where(!Scale.bloomMightContain(col("key"), bits, mBits, kHash))
        .count()
      assert(missed == 0L, s"mBits=$mBits kHash=$kHash lost a member")
    }
  }

  test("pre-filter passes exactly the joinable rows plus rare false positives") {
    val d = TestSpark.sf0001
    val hi = Tables.orders(spark, d).where(col("o_totalprice") > 450000.0)
    val keys = hi.select(col("o_orderkey").as("key"))
    val b = Scale.bloomBits(keys, "key", mBits)
    val li = Tables.lineitem(spark, d)
    val total = li.count()
    val passed = li.where(Scale.bloomMightContain(col("l_orderkey"), b, mBits)).count()
    val joinable = li.join(hi, col("l_orderkey") === col("o_orderkey")).count()
    info(s"lineitem rows: $total total, $passed past bloom, $joinable joinable")
    assert(passed >= joinable, "no joinable row may be dropped")
    assert(passed <= joinable + (total - joinable) / 50,
      "pre-filter must remove the overwhelming share of non-joinable rows")
    assert(passed < total / 2, "the filter actually prunes the scan")
  }

  test("q97 equals the plain join-aggregate (bloom changes row flow, not values)") {
    val d = TestSpark.sf0001
    val got = graft.SparkEntry.queries("q97_bloom_prejoin")(spark, d)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).where(col("o_totalprice") > 450000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(QueryDef.dec(col("l_extendedprice")) * (lit(1) - QueryDef.dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.sameElements(want))
  }
}
