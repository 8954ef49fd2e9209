package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q361 exact-substring span dedup (VERDICT r14 #5): planted-span
  * recovery at ARBITRARY alignment, driven through the real gates over
  * synthetic documents tables — including the constructive proof that
  * q143's stride-16 screen misses a plant whose two offsets differ
  * mod 16 while q361 recovers it exactly. */
class Batch24Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // globally-unique filler so NOTHING repeats except the plants
  private def tok(d: Int, i: Int) = s"u${d}_$i"
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-b24").toString
    rows.map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val span = (0 until 50).map(i => s"dup_$i")

  /** One 50-token span planted at offset 0 in doc 1 and offset 7 in
    * doc 2 — the offsets differ mod 16, so q143's fingerprint grids
    * never sample the same repeat-relative 32-token window. */
  private lazy val misalignedDir: String = writeDocs(Seq(
    1L -> (span ++ (0 until 30).map(tok(1, _))).mkString(" "),
    2L -> ((0 until 7).map(tok(2, _)) ++ span ++
      (0 until 23).map(i => tok(2, 100 + i))).mkString(" "),
    3L -> (0 until 80).map(tok(3, _)).mkString(" ")))

  test("q361 recovers a planted 50-token span EXACTLY at offsets that " +
      "differ mod 16") {
    val out = SparkEntry.queries("q361_exact_spans")(spark, misalignedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((1L, 0L, 50L), (2L, 7L, 50L)))
  }

  test("q143's stride-16 screen provably misses the same plant") {
    val out = SparkEntry.queries("q143_repeated_spans")(spark, misalignedDir)
      .select("doc_id", "n_cross_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.forall(_._2 == 0L),
      "a cross-doc repeat misaligned mod 16 is invisible to the fixed " +
        "stride grid — the gap q361 closes")
  }

  test("q361 sweep-line-unions overlapping partner coverage into one " +
      "maximal interval") {
    // doc 12 = 60 common tokens + filler; doc 10 shares its [0, 50),
    // doc 11 shares its [10, 60) — doc 12's covered set must come back
    // as the SINGLE maximal interval [0, 60), not two fragments. The
    // 40-token overlap between docs 10 and 11 stays below L and must
    // NOT pair them with each other.
    val common = (0 until 60).map(i => s"c_$i")
    val dir = writeDocs(Seq(
      10L -> (common.take(50) ++ (0 until 30).map(tok(10, _))).mkString(" "),
      11L -> ((0 until 10).map(tok(11, _)) ++ common.drop(10) ++
        (0 until 20).map(i => tok(11, 100 + i))).mkString(" "),
      12L -> (common ++ (0 until 20).map(tok(12, _))).mkString(" ")))
    val out = SparkEntry.queries("q361_exact_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((10L, 0L, 50L), (11L, 10L, 50L), (12L, 0L, 60L)))
  }
}
