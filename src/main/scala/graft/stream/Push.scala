package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import scala.collection.mutable.ArrayBuffer

/** Push-mode pipelines — the reference's output-range front-end
  * (`pass!E`, flod range.d:211-237; DriveMode.source, SURVEY.md §3.3):
  * external code pushes chunks in, the pipeline runs sink-ward.
  *
  * Spark mapping: `MemoryStream[T]` + a Structured Streaming query; each
  * `put` is processed synchronously at micro-batch granularity (the
  * documented fidelity bound, SURVEY.md §7.4 — flod's fiber switch is
  * per-buffer, ours is per-batch).
  *
  * Backpressure: flod halts the driving loop when a sink accepts a short
  * count (adapter.d:110-113). `Push.take(n)` reproduces that contract:
  * `put` returns the number of elements the pipeline will still accept;
  * 0 tells the producer to stop.
  */
final class Push[T: Encoder, U](spark: SparkSession,
                                transform: Dataset[T] => Dataset[U],
                                limit: Option[Long] = None) {

  private val source = MemoryStream[T](spark)
  private val sink = ArrayBuffer.empty[U]
  @volatile private var accepted = 0L

  private val query: StreamingQuery =
    transform(source.toDS())
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[U], _: Long) =>
        val rows = batch.collect()
        sink.synchronized {
          val room = limit.map(l => (l - sink.length).max(0L).toInt).getOrElse(rows.length)
          sink ++= rows.take(room)
        }
        ()
      }
      .start()

  /** Push one chunk; returns how many further elements the pipeline will
    * accept (0 = stop, short-write backpressure). */
  def put(chunk: Seq[T]): Long = {
    source.addData(chunk)
    query.processAllAvailable()
    accepted += chunk.length
    limit match {
      case Some(l) =>
        val filled: Int = sink.synchronized(sink.length)
        val room: Long = l - filled.toLong
        if (room > 0L) room else 0L
      case None => Long.MaxValue
    }
  }

  /** Elements that reached the sink, in arrival order. */
  def result: Seq[U] = sink.synchronized(sink.toVector)

  def close(): Unit = query.stop()
}

object Push {
  /** `pass!E.copy(appender)` — identity push pipeline into a collector. */
  def pass[T: Encoder](spark: SparkSession): Push[T, T] =
    new Push[T, T](spark, identity)

  /** Push pipeline with a transform stage. */
  def apply[T: Encoder, U](spark: SparkSession)(f: Dataset[T] => Dataset[U]): Push[T, U] =
    new Push[T, U](spark, f)

  /** Push pipeline that stops accepting after `n` sink elements — the
    * streaming `take` (flod T1 under DriveMode.source). */
  def take[T: Encoder](spark: SparkSession, n: Long): Push[T, T] =
    new Push[T, T](spark, identity, Some(n))

  /** S3 `DelegateSource` (flod range.d:169-189): the user lambda receives
    * the put handle and IS the driver `run()` loop; returns everything
    * that reached the sink. The handle's return value carries the
    * short-write backpressure signal, as in the reference. */
  def drive[T: Encoder](spark: SparkSession, limit: Option[Long] = None)
                       (producer: (Seq[T] => Long) => Unit): Seq[T] = {
    val p = new Push[T, T](spark, identity, limit)
    try { producer(p.put); p.result } finally p.close()
  }

  /** Push pipeline with a DISTRIBUTED file sink: each micro-batch is
    * written by the executors (append-mode parquet), nothing is
    * collected to the driver — the production counterpart of the
    * driver-side collector sinks above, which mirror flod's
    * single-threaded terminals. Returns a handle whose `put` pushes a
    * chunk synchronously; read the sink directory when done. */
  def toPath[T: Encoder, U](spark: SparkSession, path: String)
                           (transform: Dataset[T] => Dataset[U]): PushSink[T] = {
    val source = MemoryStream[T](spark)
    val query = transform(source.toDS())
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[U], _: Long) =>
        batch.write.mode("append").parquet(path)
        ()
      }
      .start()
    new PushSink[T](source, query)
  }

  /** Handle for [[toPath]]: synchronous put + close. */
  final class PushSink[T] private[Push] (source: MemoryStream[T], query: StreamingQuery) {
    def put(chunk: Seq[T]): Unit = { source.addData(chunk); query.processAllAvailable() }
    def close(): Unit = query.stop()
  }

  /** Fan-out push pipeline (demux/multicast) — the push-mode face of
    * flod's own roadmap item (README.md:46-47, "multiplexing and
    * demultiplexing streams"): ONE MemoryStream source, ONE streaming
    * query, TWO collector sinks with independent capacity limits and
    * independent route transforms (overlapping routes multicast,
    * disjoint ones demux). Each micro-batch is pinned (`persist`) so
    * both routes observe identical rows.
    *
    * Backpressure: `put` returns the MINIMUM remaining room across the
    * two sinks — flod's short-write halt contract (adapter.d:110-113)
    * extended across a demux: the producer must stop as soon as ANY
    * branch is full, else that branch drops data. 0 = stop. */
  final class PushTee[T: Encoder] private[Push] (spark: SparkSession,
      routeA: Dataset[T] => Dataset[T], limitA: Long,
      routeB: Dataset[T] => Dataset[T], limitB: Long) {
    private val source = MemoryStream[T](spark)
    private val sinkA = ArrayBuffer.empty[T]
    private val sinkB = ArrayBuffer.empty[T]

    private val query: StreamingQuery =
      source.toDS().writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[T], _: Long) =>
          batch.persist()
          try {
            val ra = routeA(batch).collect()
            val rb = routeB(batch).collect()
            sinkA.synchronized {
              sinkA ++= ra.take((limitA - sinkA.length).max(0L).toInt) }
            sinkB.synchronized {
              sinkB ++= rb.take((limitB - sinkB.length).max(0L).toInt) }
          } finally { batch.unpersist(); () }
          ()
        }
        .start()

    /** Push one chunk; returns min remaining room across both sinks. */
    def put(chunk: Seq[T]): Long = {
      source.addData(chunk)
      query.processAllAvailable()
      // int locals first: inlining the synchronized-block result into
      // the long subtraction trips a scalac bytecode-verifier bug
      val lenA: Int = sinkA.synchronized(sinkA.length)
      val lenB: Int = sinkB.synchronized(sinkB.length)
      val roomA = limitA - lenA.toLong
      val roomB = limitB - lenB.toLong
      math.max(0L, math.min(roomA, roomB))
    }

    def resultA: Seq[T] = sinkA.synchronized(sinkA.toVector)
    def resultB: Seq[T] = sinkB.synchronized(sinkB.toVector)
    def close(): Unit = query.stop()
  }

  /** Build a [[PushTee]]: two routed, capacity-limited sinks off one
    * pushed stream. */
  def tee[T: Encoder](spark: SparkSession,
                      routeA: Dataset[T] => Dataset[T], limitA: Long,
                      routeB: Dataset[T] => Dataset[T], limitB: Long): PushTee[T] =
    new PushTee[T](spark, routeA, limitA, routeB, limitB)

  /** Demux with DISTRIBUTED sinks — the production face of [[tee]]:
    * [[PushTee]]'s collector sinks are driver-side by contract (they
    * mirror flod's single-threaded terminals), so at scale a demux
    * needs this variant instead: ONE source, ONE streaming query, each
    * micro-batch pinned (`persist`) and routed to TWO executor-written
    * append-parquet sinks — rows never stage through the driver, and
    * both routes observe the identical pinned batch (no recompute
    * divergence between branches). No capacity limits: file sinks
    * don't fill; backpressure is the durable store's problem. */
  def teeToPath[T: Encoder](spark: SparkSession,
                            routeA: Dataset[T] => Dataset[T], pathA: String,
                            routeB: Dataset[T] => Dataset[T], pathB: String): PushSink[T] = {
    val source = MemoryStream[T](spark)
    val query = source.toDS().writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        batch.persist()
        try {
          routeA(batch).write.mode("append").parquet(pathA)
          routeB(batch).write.mode("append").parquet(pathB)
        } finally { batch.unpersist(); () }
        ()
      }
      .start()
    new PushSink[T](source, query)
  }
}
