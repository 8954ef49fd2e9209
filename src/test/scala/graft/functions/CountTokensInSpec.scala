package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_count_tokens_in must equal the composed
  * `size(filter(split(text, " "), w => w.isInCollection(words)))` form
  * it replaced in q21/q22 (stop-ratio, lang-id) and the single-term
  * `size(filter(toks, _ === term))` tf in q73's BM25 — the oracles
  * bake those counts into ratios and scores.
  */
class CountTokensInSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words = Seq("the", "a", "of", "and", "in", "")

  private def composedStr: org.apache.spark.sql.Column =
    size(filter(split(col("t"), " "), w => w.isInCollection(words)))

  private val hostile = Seq(
    "the cat of a hat",
    "", " ", "  the  ",       // empty tokens: "" is IN the word set here
    "no stops here",
    "the the the",
    "The THE the",            // case-sensitive like the composed form
    "a,b the",                // commas in TEXT are fine (set is the literal)
    "trailing the ")

  test("string input identical to composed filter/isInCollection") {
    val rnd = new scala.util.Random(21)
    val vocab = Seq("the", "a", "of", "and", "in", "cat", "dog", "x", "")
    val random = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val rows = (hostile ++ random).toDF("t")
      .select(call_function("graft_count_tokens_in",
          col("t"), lit(words.mkString(","))).as("native"),
        composedStr.as("comp"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on ${r.getInt(0)} vs ${r.getInt(1)}")
    }
  }

  test("array input: single-term tf identical to composed equality filter") {
    val rnd = new scala.util.Random(73)
    val vocab = Seq("spark", "query", "engine", "the", "data")
    val docs = (1 to 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
    }
    val rows = docs.toDF("w")
      .select(call_function("graft_count_tokens_in",
          col("w"), lit("spark")).as("native"),
        size(filter(col("w"), x => x === "spark")).as("comp"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("null array elements never match; null input propagates") {
    val got = Seq(
        (Some(Seq(Some("a"), None, Some("b"), Some("a")))),
        (None: Option[Seq[Option[String]]]))
      .toDF("w")
      .select(call_function("graft_count_tokens_in", col("w"), lit("a,b")).as("c"))
      .collect()
    assert(got(0).getInt(0) == 3)
    assert(got(1).isNullAt(0))
  }

  test("builder rejects non-literal word set at analysis") {
    val e = intercept[Exception] {
      Seq(("x", "y")).toDF("t", "w")
        .select(call_function("graft_count_tokens_in", col("t"), col("w")))
        .collect()
    }
    assert(e.getMessage.contains("graft_count_tokens_in"))
  }
}
