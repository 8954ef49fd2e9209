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
}
