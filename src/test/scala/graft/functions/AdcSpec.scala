package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_adc must be bit-identical to the composed
  * `aggregate(zip_with(tabs, codes, (t,c) => element_at(t, c+1)), 0d, +)`
  * form it replaced in q95's ADC scoring — both are strict left folds
  * in subspace order, so every IEEE rounding step matches and the
  * baked DuckDB oracle (an ordered list fold) is unaffected.
  */
class AdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed: org.apache.spark.sql.Column =
    aggregate(zip_with(col("tabs"), col("codes"),
        (t, c) => element_at(t, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the composed zip_with/aggregate fold") {
    val rnd = new scala.util.Random(95)
    val rows = (1 to 200).map { _ =>
      val m = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(16)
      val tabs = Seq.fill(m)(Seq.fill(k)(
        // hostile magnitudes: rounding order matters if order differs
        (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(9) - 4)))
      val codes = Seq.fill(m)(rnd.nextInt(k))
      (tabs, codes)
    }
    val got = rows.toDF("tabs", "codes")
      .select(call_function("graft_adc", col("tabs"), col("codes")).as("native"),
        composed.as("comp"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("empty arrays fold to 0; null propagates") {
    val got = Seq(
        (Some(Seq.empty[Seq[Double]]), Some(Seq.empty[Int])),
        (None, Some(Seq(0))))
      .toDF("tabs", "codes")
      .select(call_function("graft_adc", col("tabs"), col("codes")).as("d"))
      .collect()
    assert(got(0).getDouble(0) == 0.0)
    assert(got(1).isNullAt(0))
  }

  test("builder rejects wrong arity and wrong types at analysis") {
    val e1 = intercept[Exception] {
      Seq(1).toDF("x").select(call_function("graft_adc", col("x"))).collect()
    }
    assert(e1.getMessage.contains("graft_adc"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("graft_adc", col("a"), col("b"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("graft_adc"))
  }
}
