package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_nfc must implement UAX #15 canonical composition exactly as
  * java.text.Normalizer (and DuckDB's nfc_normalize, which the q344
  * oracle leans on) define it — pinned here on the known composition
  * shapes plus a reference cross-check over random combining text.
  * CAUTION: the decomposed-vs-precomposed distinction is the entire
  * subject, and the literals below carry it as raw UTF-8 bytes —
  * inputs hold base + combining mark (e.g. `e` U+0065 + U+0301),
  * expectations the precomposed codepoint (U+00E9). Do not let an
  * editor or formatter Unicode-normalize this file. */
class NfcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nfc(rows: Seq[String]): Seq[String] =
    rows.toDF("t")
      .select(call_function("graft_nfc", col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("combining acute composes; precomposed passes through unchanged") {
    assert(nfc(Seq("é", "é", "abc", "")) ==
      Seq("é", "é", "abc", ""))
  }

  test("multi-codepoint sequences compose canonically") {
    // a+ring -> U+00E5, o+diaeresis -> U+00F6; mixed text composes in place
    assert(nfc(Seq("åö", "café au lait")) ==
      Seq("åö", "café au lait"))
  }

  test("Hangul jamo compose to a syllable") {
    // CHOSEONG KIYEOK (U+1100) + JUNGSEONG A (U+1161) -> GA (U+AC00)
    assert(nfc(Seq("가")) == Seq("가"))
  }

  test("null stays null; non-string input fails analysis") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(call_function("graft_nfc", col("t"))).collect()
    assert(r.head.isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(call_function("graft_nfc", col("x"))).collect()
    }
    assert(e.getMessage.contains("graft_nfc"))
  }

  test("agrees with java.text.Normalizer on random combining text") {
    val rnd = new scala.util.Random(7)
    val marks = Seq("̀", "́", "̈", "̊", "")
    val bases = Seq("a", "e", "o", "u", "n", "Z", "1", " ")
    val inputs = (1 to 200).map { _ =>
      (1 to rnd.nextInt(12)).map(_ =>
        bases(rnd.nextInt(bases.size)) + marks(rnd.nextInt(marks.size))).mkString
    }
    val expect = inputs.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(nfc(inputs) == expect)
  }
}
