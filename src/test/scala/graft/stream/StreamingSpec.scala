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

  test("tumbling window under the RocksDB state store == batch") {
    // the production state backend at 100 TB (bounded executor heap,
    // state spills to local disk): same transform, same result. The
    // provider is bound at query start, so setting the session conf
    // around runBounded is enough.
    val events = Tables.events(spark, TestSpark.sf0001)
    val batch = StreamOps.tumbling(events).collect().toSeq
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = StreamOps.runBounded(spark, events, StreamOps.tumbling(_))
      assert(canon(streamed) == canon(batch))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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

  test("stream-stream interval join == batch join (click -> purchase)") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, TestSpark.sf0001)
    // sentinel event far past the corpus pushes the watermark beyond
    // every real event so append-mode emits all matches on the bounded
    // replay; its type matches neither join side
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 864000L * 1000L)
    val sentinelRow = events.sparkSession.sql(
      s"SELECT -1L AS event_id, TIMESTAMP '$sentinelTs' AS ts, " +
        "-1L AS user_id, 'sentinel' AS event_type, 0.0D AS value, '{}' AS props")
    val input = events.unionByName(sentinelRow)
    val batch = StreamOps.clickToPurchase(events).collect().toSeq
    val streamed = StreamOps.runBounded(spark, input,
      StreamOps.clickToPurchase(_), outputMode = "append")
    assert(canon(streamed) == canon(batch))
    assert(batch.nonEmpty, "corpus must contain click->purchase pairs")
  }
}
