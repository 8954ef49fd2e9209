package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_jaro_winkler must match DuckDB's jaro_winkler_similarity —
  * the oracle engine — whose semantics were probed empirically: boost
  * only when jaro > 0.7, prefix cap 4, empty input → 0, zero matches
  * → 0. Fixture values below are DuckDB's own outputs (round@6). */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = Seq(
    ("MARTHA", "MARHTA", 0.961111),          // classic Winkler example
    ("DIXON", "DICKSONX", 0.813333),
    ("JELLYFISH", "SMELLYFISH", 0.896296),   // jaro > 0.7, no prefix
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),                        // DuckDB: empty → 0
    ("", "", 0.0),                           // DuckDB: both empty → 0
    ("a", "b", 0.0),                         // zero matches
    ("CRATE", "TRACE", 0.733333),            // transpositions, no prefix
    ("prefix_same", "prefix_diff", 0.854545),// prefix CAP at 4
    ("DwAyNE", "DuANE", 0.84),
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96),
    ("abcdxxxxx", "abcdyyyyyyyyy", 0.584046),// jaro <= 0.7: NO boost
    ("abwwwwww", "abzzzzzz", 0.5),           // jaro <= 0.7: NO boost
    ("ax", "ay", 0.666667),                  // exactly-at-0.7 boundary class
    ("abcdefgh", "abdcefgh", 0.966667))

  test("matches DuckDB's probed values at 6 dp") {
    val df = fixtures.toDF("a", "b", "want")
    val bad = df.select(col("a"), col("b"), col("want"),
        round(JaroWinkler(col("a"), col("b")), 6).as("got"))
      .where(col("got") =!= col("want"))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("symmetric, null-propagating, SQL-callable") {
    val df = fixtures.toDF("a", "b", "want")
    assert(df.where(
      round(JaroWinkler(col("a"), col("b")), 6) =!=
        round(JaroWinkler(col("b"), col("a")), 6)).count() === 0L)
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw"))
    assert(n.where(col("jw").isNotNull).count() === 0L)
    assert(spark.sql("SELECT round(graft_jaro_winkler('MARTHA','MARHTA'), 6) AS v")
      .head().getDouble(0) === 0.961111)
  }
}
