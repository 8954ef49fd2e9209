package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_match_any (Aho–Corasick multi-pattern scan) semantics: must
  * equal naive per-pattern `contains` on every input — including the
  * shapes that break naive trie walks (overlapping patterns, one
  * pattern inside another, matches entered via failure links). */
class MatchAnySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def naive(text: String, pats: Seq[String]): Seq[String] =
    pats.filter(text.contains)

  private def viaSpark(texts: Seq[String], pats: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("t").select(MatchAny(col("t"), pats).as("m"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  test("overlap shapes: nested patterns, suffix entry via failure links, order preserved") {
    val pats = Seq("table part", "part", "art", "she", "he", "hers")
    val cases = Seq(
      "the table parts arrived",      // "table part", "part", "art"
      "ushers",                       // "she", "he", "hers" — all via overlap
      "artistry",                     // "art" only
      "he",                           // "he" only
      "",                             // nothing
      "tabletable part")              // nested long pattern
    val got = viaSpark(cases, pats)
    cases.zip(got).foreach { case (t, m) =>
      assert(m == naive(t, pats), s"input '$t'")
    }
    // output follows PATTERN order, not match position ("he" hits
    // inside "the" yet sorts by its pattern index, not offset 1)
    assert(got.head == Seq("table part", "part", "art", "he"))
  }

  test("each pattern reported once even with many occurrences") {
    val got = viaSpark(Seq("ab ab ab ab"), Seq("ab", "b a"))
    assert(got.head == Seq("ab", "b a"))
  }

  test("property: equals naive contains on random byte soup (incl. multi-byte UTF-8)") {
    val rnd = new scala.util.Random(4213)
    val alphabet = "abcé中 "
    def randStr(n: Int) =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats0 = Seq.fill(12)(randStr(1 + rnd.nextInt(4))).distinct
    val pats = pats0.filter(_.nonEmpty)
    val texts = Seq.fill(200)(randStr(rnd.nextInt(40)))
    val got = viaSpark(texts, pats)
    texts.zip(got).foreach { case (t, m) =>
      assert(m == naive(t, pats), s"input '$t' pats $pats")
    }
  }

  test("works from SQL and survives codegen with a null column") {
    import spark.implicits._
    Seq(("x", Some("the part")), ("y", None: Option[String]))
      .toDF("k", "t").createOrReplaceTempView("ma_in")
    val rows = spark.sql(
      "SELECT k, graft_match_any(t, array('part', 'zzz')) AS m FROM ma_in ORDER BY k")
      .collect()
    assert(rows(0).getSeq[String](1) == Seq("part"))
    assert(rows(1).isNullAt(1), "null text -> null result")
  }

  test("non-literal pattern list fails analysis with a named error") {
    import spark.implicits._
    val df = Seq(("a", Seq("a"))).toDF("t", "p")
    val e = intercept[Exception] {
      df.select(call_function("graft_match_any", col("t"), col("p"))).collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("empty patterns are rejected at build") {
    val e = intercept[Exception] { viaSpark(Seq("x"), Seq("a", "")) }
    assert(e.getMessage.contains("empty pattern"))
  }
}
