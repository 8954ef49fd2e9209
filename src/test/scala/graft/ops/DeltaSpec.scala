package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Snapshot diff: classification of every change kind, and the scale
  * contract — only (key, digest) reaches the full-outer shuffle. */
class DeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("classifies added, removed, changed; drops unchanged") {
    val old = frame(1L -> "alpha", 2L -> "bravo", 3L -> "charlie", 4L -> "delta")
    val neu = frame(2L -> "bravo", 3L -> "charlie EDITED", 4L -> "delta", 5L -> "echo")
    val got = Delta.snapshotDiff(old, neu, "doc_id", col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("digests of changed rows differ; unchanged pair would collide") {
    val old = frame(1L -> "same")
    val neu = frame(1L -> "different")
    val row = Delta.snapshotDiff(old, neu, "doc_id", col("text")).first()
    assert(row.getString(1) == "changed")
    assert(row.getString(2).length == 32 && row.getString(3).length == 32)
    assert(row.getString(2) != row.getString(3))
    assert(Delta.snapshotDiff(old, old, "doc_id", col("text")).isEmpty)
  }

  test("incremental dedup: prior index wins over batch order; first-new keeps") {
    val prior = frame(1L -> "alpha", 2L -> "bravo")
    val incoming = frame(
      10L -> "charlie", // new
      11L -> "alpha",   // dup_of_prior (index has it as id 1)
      12L -> "charlie", // dup_within_batch (10 saw it first)
      13L -> "bravo",   // dup_of_prior even though 13 is unique in-batch
      14L -> "delta")   // new
    val got = Delta.incrementalDedup(prior, incoming, col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (10L, -1L, "new"),
      (11L, 1L, "dup_of_prior"),
      (12L, -1L, "dup_within_batch"),
      (13L, 2L, "dup_of_prior"),
      (14L, -1L, "new")))
  }

  test("incremental dedup: empty prior index degrades to plain within-batch dedup") {
    val prior = frame()
    val incoming = frame(1L -> "x", 2L -> "x", 3L -> "y")
    val got = Delta.incrementalDedup(prior, incoming, col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq(1L -> "new", 2L -> "dup_within_batch", 3L -> "new"))
  }

  test("only (key, digest) reaches the full-outer join — text is pruned pre-shuffle") {
    val old = frame(1L -> "a"); val neu = frame(1L -> "b")
    val joins = Delta.snapshotDiff(old, neu, "doc_id", col("text"))
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(j.left.output.map(_.name).toSet == Set("doc_id", "old_digest"),
        s"left side must carry only key+digest, got ${j.left.output}")
      assert(j.right.output.map(_.name).toSet == Set("doc_id", "new_digest"),
        s"right side must carry only key+digest, got ${j.right.output}")
    }
  }
}
