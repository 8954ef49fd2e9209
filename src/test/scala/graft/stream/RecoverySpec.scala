package graft.stream

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once file→file streaming with checkpoint recovery: stop a
  * query mid-stream, restart from the checkpoint, and verify the output
  * holds every input row exactly once — the fault-tolerance contract a
  * 100 TB continuous pipeline runs on (source offsets + sink commit log).
  */
class RecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("restart from checkpoint neither loses nor duplicates rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_recovery")
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    try {
      // stage the input as 4 separate files so triggers see them one at a time
      val ev = Tables.events(spark, TestSpark.sf0001).select("event_id", "event_type", "value")
      ev.withColumn("part", pmod(col("event_id"), lit(4)))
        .repartitionByRange(4, col("part")).drop("part")
        .write.mode("overwrite").parquet(inDir)

      def startQuery() = spark.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
        .withColumn("v2", col("value") * 2)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("50 milliseconds"))
        .start()

      // phase 1: run until some (not all) batches are committed, then stop
      val q1 = startQuery()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.map(_.numInputRows).sum == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      q1.stop()
      val afterPhase1 = spark.read.parquet(outDir).count()

      // phase 2: restart from the same checkpoint and drain
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()

      val out = spark.read.parquet(outDir)
      assert(out.count() == ev.count(), s"phase1 had $afterPhase1 rows")
      assert(out.select("event_id").distinct().count() == ev.count(), "no duplicates")
      // transform applied everywhere
      assert(out.where(col("v2") =!= col("value") * 2).count() == 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(base.toFile).deleteRecursively()
    }
  }
}
