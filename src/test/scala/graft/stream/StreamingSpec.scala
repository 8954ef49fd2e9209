package graft.stream

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Streaming/batch equivalence: the same event-time transforms produce
  * identical results replayed through MemoryStream micro-batches as in
  * one batch pass (SURVEY.md §3.3: push-mode ≙ Structured Streaming). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(rows: Seq[Row]): Seq[Seq[String]] =
    rows.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  test("tumbling window: streaming == batch") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val batch = StreamOps.tumbling(events).collect().toSeq
    val streamed = StreamOps.runBounded(spark, events, StreamOps.tumbling(_))
    assert(canon(streamed) == canon(batch))
  }

  test("session windows: streaming == batch") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val batch = StreamOps.sessions(events).collect().toSeq
    val streamed = StreamOps.runBounded(spark, events, StreamOps.sessions(_))
    assert(canon(streamed) == canon(batch))
  }

  test("sliding window: streaming == batch") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val batch = StreamOps.sliding(events).collect().toSeq
    val streamed = StreamOps.runBounded(spark, events, StreamOps.sliding(_))
    assert(canon(streamed) == canon(batch))
  }
}
