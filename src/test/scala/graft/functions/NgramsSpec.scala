package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_ngrams must be BIT-identical to the composed
  * transform/concat_ws/array_distinct form it replaced — the dedup
  * family's oracle hashes depend on it. */
class NgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The composed form exactly as Dedup/TrainPrep wrote it. */
  private def composed(t: org.apache.spark.sql.Column, n: Int,
      dedupe: Boolean): org.apache.spark.sql.Column = {
    val w = split(t, " ")
    val g = when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array(t))
    if (dedupe) array_distinct(g) else g
  }

  private val hostile = Seq(
    "a b c d e",
    "a a a a a a",            // mass repetition: distinct collapses
    "one",                    // shorter than n: whole-text fallback
    "", " ", "  ",            // empty + space-only: empty tokens kept
    "x  y z",                 // double space => empty middle token
    "trailing space ",        // trailing empty token kept
    " leading",
    "中 文 词 表",  // unicode tokens
    "tab\tis one token b c")

  test("identical to the composed form on hostile and random inputs") {
    val rnd = new scala.util.Random(11)
    val random = (1 to 200).map { _ =>
      Seq.fill(rnd.nextInt(12))(s"w${rnd.nextInt(6)}").mkString(" ")
    }
    val df = (hostile ++ random).toDF("t")
    for (n <- Seq(2, 3, 6); dedupe <- Seq(true, false)) {
      val rows = df.select(
          call_function("graft_ngrams", col("t"), lit(n), lit(dedupe)).as("native"),
          composed(col("t"), n, dedupe).as("comp"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n dedupe=$dedupe input mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("null propagates, and the expression survives both codegen and interpreted paths") {
    val df = Seq(Some("a b c d"), None).toDF("t")
    val got = df.select(
        call_function("graft_ngrams", col("t"), lit(3), lit(true)).as("g"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).isNullAt(0))
    // interpreted path (eval): force by using it inside a filter on a
    // literal — and directly via the expression's eval contract
    val arr = Ngrams.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c d"), 3, false)
    assert(arr.numElements() == 2)
  }

  test("char ngrams identical to the composed substr form") {
    // non-BMP inputs included: Spark substr counts CODEPOINTS, so the
    // native form must never split a surrogate pair (emoji below are
    // supplementary-plane, 2 UTF-16 code units each)
    val inputs = (hostile ++ Seq("abc", "ab", "abcd efg", "中文词",
      "a😀b😁c", "😀😁😂😃", "x😀", "𝕊𝕡𝕒𝕣𝕜 sql")).toDF("t")
    val rows = inputs.where(length(col("t")) >= 3).select(
        call_function("graft_char_ngrams", col("t"), lit(3)).as("native"),
        transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3))).as("comp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // below-length inputs yield an empty array (callers' length guard)
    val short = Seq("ab").toDF("t")
      .select(call_function("graft_char_ngrams", col("t"), lit(3)).as("g"))
      .collect()
    assert(short(0).getSeq[String](0).isEmpty)
  }
}
