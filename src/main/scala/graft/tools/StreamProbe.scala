package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-loop decomposition probe for the stream-replay gate class
  * (VERDICT r18 #6): runs the named stream-executed gates solo and
  * aggregates the engine's own per-batch duration breakdown
  * (`StreamingQueryProgress.durationMs`) — triggerExecution,
  * queryPlanning, addBatch, commitOffsets, walCommit, getBatch —
  * so the "per-batch floor is engine re-planning + state-store
  * commit" adjudication rests on engine-reported numbers, not wall
  * subtraction. Not part of any declared query path. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // aggregate durationMs across every batch of every query run since
    // the last reset, keyed by metric name
    val agg = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        e.progress.durationMs.forEach((k, v) =>
          agg.merge(k, v.longValue(), (a, b) => a + b))
        ()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val names = sys.env.getOrElse("SPARK_GRAFT_STREAM_GATES",
      "q123_stream_join,q317_stream_outer_join,q252_stream_balance," +
        "q184_stream_dedup,q187_stream_interval_union")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // one warmup replay to absorb state-store/checkpoint class init
    graft.SparkEntry.queries(names.head)(spark, sfDir).count()
    names.foreach { n =>
      agg.clear(); batches.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val parts = agg.asScala.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=${v / 1000.0}%.2fs" }.mkString(" ")
      println(f"STREAM $n%-28s wall=$wall%6.2fs batches=${batches.get()}%2d $parts")
    }
    spark.stop()
  }
}
