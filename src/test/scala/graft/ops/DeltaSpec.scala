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

  test("NULL payloads classify by key presence, not digest nullness") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Delta.snapshotDiff(old, neu, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: NULL -> NULL is unchanged (dropped); 2: value -> NULL is
    // changed; 3: removed; 4: added — NONE misread as added via a NULL digest
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshot diff matches a random edit script") {
    val rnd = new scala.util.Random(37)
    for (_ <- 1 to 3) {
      val base = (0L until 60L).map(i => i -> s"doc-$i-${rnd.nextInt(5)}").toMap
      // random script: each key independently kept/edited/removed in v2;
      // plus fresh keys added
      val edited = base.map { case (k, v) =>
        rnd.nextInt(3) match {
          case 0 => k -> Some(v)              // unchanged
          case 1 => k -> Some(v + "-edit")    // changed
          case 2 => k -> None                 // removed
        }
      }
      val added = (100L until 100L + rnd.nextInt(10)).map(k => k -> s"new-$k")
      val v2 = edited.collect { case (k, Some(v)) => k -> v } ++ added
      val want = (edited.collect { case (k, None) => k -> "removed" } ++
        edited.collect { case (k, Some(v)) if v != base(k) => k -> "changed" } ++
        added.map { case (k, _) => k -> "added" }).toMap
      val got = Delta.snapshotDiff(
          base.toSeq.toDF("doc_id", "text"), v2.toSeq.toDF("doc_id", "text"),
          "doc_id", col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want)
    }
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
      assert(j.left.output.map(_.name).toSet == Set("doc_id", "old_digest", "_in_old"),
        s"left side must carry only key+digest+presence, got ${j.left.output}")
      assert(j.right.output.map(_.name).toSet == Set("doc_id", "new_digest", "_in_new"),
        s"right side must carry only key+digest+presence, got ${j.right.output}")
      assert(!j.left.output.map(_.name).contains("text") &&
        !j.right.output.map(_.name).contains("text"), "text never reaches the shuffle")
    }
  }
}
