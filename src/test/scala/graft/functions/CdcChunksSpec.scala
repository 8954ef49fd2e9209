package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_cdc_chunks must be BIT-identical to the composed
  * transform/filter/zip_with form it replaced — q83's baked oracle
  * recomputes the same md5-slice boundary rule. */
class CdcChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The composed form exactly as TrainPrep.cdcChunkDedup wrote it
    * through round 8. */
  private def composed(n: Int, m: Int): org.apache.spark.sql.Column = {
    val w = split(col("t"), " ")
    val len = size(w)
    val starts0 = when(len >= n, sequence(lit(0), len - n))
      .otherwise(array().cast("array<int>"))
    val ends = transform(
      filter(starts0, i =>
        conv(substring(md5(concat_ws(" ", slice(w, i + 1, lit(n)))), 1, 8), 16, 10)
          .cast("long") % m === 0),
      i => i + n - 1)
    val chunkStarts = concat(array(lit(0)), transform(ends, e => e + 1))
    val chunkStops = concat(ends, array(len - 1))
    filter(
      zip_with(chunkStarts, chunkStops, (s, e) =>
        when(e >= s, concat_ws(" ", slice(w, s + 1, e - s + 1)))),
      c => c.isNotNull)
  }

  private val hostile = Seq(
    "",                        // split("") = [""]: one empty chunk
    " ", "  ",                 // space-only: empty tokens kept
    "one two three",           // shorter than n=4: whole-text chunk
    "x  y z q r",              // double space => empty middle token
    "trailing space tok tok2 ",
    " leading a b c d e f",
    "中 文 词 表 很 长 的 一 句 话", // non-ASCII utf-8 window hashing
    Seq.fill(40)("dup").mkString(" "), // mass repetition: every window equal
    (1 to 60).map(i => s"t$i").mkString(" "))

  test("identical to the composed form on hostile and random inputs") {
    val rnd = new scala.util.Random(83)
    val random = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(50))(s"w${rnd.nextInt(8)}").mkString(" ")
    }
    val df = (hostile ++ random).toDF("t")
    for ((n, m) <- Seq((4, 8), (3, 4), (2, 2), (5, 16))) {
      val rows = df.select(
          call_function("graft_cdc_chunks", col("t"), lit(n), lit(m)).as("native"),
          composed(n, m).as("comp"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n m=$m mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
      // the chunks partition the document: rejoining them restores it
      val rejoin = df.select(col("t"),
          concat_ws(" ", call_function("graft_cdc_chunks", col("t"), lit(n), lit(m))).as("r"))
        .collect()
      rejoin.foreach(r => assert(r.getString(0) == r.getString(1)))
    }
  }

  test("null propagates and the interpreted eval path agrees") {
    val got = Seq(Some("a b c d e f g h"), None).toDF("t")
      .select(call_function("graft_cdc_chunks", col("t"), lit(4), lit(8)).as("c"))
      .collect()
    assert(got(0).getSeq[String](0).mkString(" ") == "a b c d e f g h")
    assert(got(1).isNullAt(0))
    val arr = CdcChunks.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e f g h"), 4, 8)
    assert((0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      .mkString(" ") == "a b c d e f g h")
  }

  test("non-literal shape arguments fail analysis with a named error") {
    // Spark wraps the builder's AnalysisException; the requirement is
    // that the failure NAMES the function and offending argument
    // instead of surfacing an opaque ClassCastException from eval()
    val e = intercept[Throwable] {
      Seq("a b").toDF("t")
        .select(call_function("graft_cdc_chunks", col("t"), length(col("t")), lit(8)))
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("graft_cdc_chunks") && msgs.contains("literal"))
  }
}
