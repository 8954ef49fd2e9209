package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_top_token_count must equal the composed
  * array_max(transform(array_distinct(...), count-in-row)) form it
  * replaced in q71 — the oracle divides it into top_token_mass. */
class TopTokenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed: org.apache.spark.sql.Column = {
    val toks = split(col("t"), " ")
    array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
  }

  private val hostile = Seq(
    "a b c d e",
    "a a a a a a",
    "one",
    "", " ", "  ",            // empty/space-only: empty tokens count
    "x  y z x x",
    "trailing space ",
    "中 文 中 表")

  test("identical to the composed nested-lambda form") {
    val rnd = new scala.util.Random(71)
    val random = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(5)}").mkString(" ")
    }
    val rows = (hostile ++ random).toDF("t")
      .select(call_function("graft_top_token_count", col("t")).as("native"),
        composed.as("comp"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch: ${r.getInt(0)} vs ${r.getInt(1)}")
    }
  }

  test("null propagates; direct eval agrees") {
    val got = Seq(Some("a a b"), None).toDF("t")
      .select(call_function("graft_top_token_count", col("t")).as("c"))
      .collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).isNullAt(0))
    assert(TopTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("x y x z x")) == 3)
  }
}
