package graft.stream

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Push-mode (DriveMode.source) semantics — flod `pass!E` output-range
  * pipelines (range.d:211-292) at micro-batch granularity. */
class PushSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pass: pushed chunks arrive in order (range.d:271-292 demo)") {
    val p = Push.pass[Long](spark)
    try {
      p.put(Seq(1L, 2L, 3L))
      p.put(Seq(4L, 5L))
      assert(p.result == Seq(1L, 2L, 3L, 4L, 5L))
    } finally p.close()
  }

  test("push through a transform stage") {
    val p = Push[Long, Long](spark)(_.map(_ * 10))
    try {
      p.put(Seq(1L, 2L)); p.put(Seq(3L))
      assert(p.result == Seq(10L, 20L, 30L))
    } finally p.close()
  }

  test("take(n) backpressure: put reports remaining room, stops at 0 (adapter.d:110-113)") {
    val p = Push.take[Long](spark, 4)
    try {
      assert(p.put(Seq(1L, 2L)) == 2)     // room for 2 more
      assert(p.put(Seq(3L, 4L, 5L)) == 0) // full: producer must stop
      assert(p.result == Seq(1L, 2L, 3L, 4L))
    } finally p.close()
  }

  test("drive: producer lambda is the run() loop (S3, range.d:169-189)") {
    val got = Push.drive[Long](spark) { put =>
      var i = 0L
      while (i < 6L) { put(Seq(i, i + 1)); i += 2 }
    }
    assert(got == (0L until 6L))
  }

  test("drive with limit: producer observes backpressure and stops") {
    var stops = 0
    val got = Push.drive[Long](spark, limit = Some(3)) { put =>
      var room = 1L
      var i = 0L
      while (room > 0) { room = put(Seq(i)); i += 1 }
      stops += 1
    }
    assert(got == Seq(0L, 1L, 2L) && stops == 1)
  }

  test("firstSeen streaming dedup drops repeats across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val source = MemoryStream[Long](spark)
    val deduped = StreamOps.firstSeen[Long, Long](source.toDS(), identity)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      source.addData(Seq(1L, 2L, 2L, 3L)); q.processAllAvailable()
      source.addData(Seq(2L, 3L, 4L)); q.processAllAvailable()
      val got = spark.table("dedup_out").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
