package graft.ops

import graft.{ScaleGen, SparkEntry, TestSpark}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** The SCALE.md scaling study folded into CI as a STANDING gate
  * (VERDICT r12 next-round #7): every recent gate runs at sf0.001 and
  * at a deterministic 3× ScaleGen replica, and the ratio of its total
  * SHUFFLE RECORDS must stay sub-quadratic.
  *
  * Why shuffle records, not wall clock: the study's wall-clock table
  * is a measurement on a quiet box — on a contended CI box the same
  * numbers are ±3× noise (VERDICT r12's "noisy six"). The INVARIANT
  * behind the table is the work law: a linear-plan gate moves O(n)
  * records through its exchanges, so 3× data ⇒ ≤~3× shuffled records,
  * deterministically (record counts are plan-logical; AQE coalescing
  * moves partition boundaries, not records). A super-linear defect of
  * the q336-pre-fix class (unbounded pairs on both sides: ×9 records
  * at ×3 data) trips the bound here before any driver run.
  *
  * Bounds are generous (linear gates get ×5 + absolute slack for
  * broadcast/threshold flips at tiny SF); the ONE documented
  * super-linear workload — q345, whose ε-graph densifies quadratically
  * under replication-with-jitter (SCALE.md round 12) — gets a wider,
  * still-bounded belt. */
class ScaleLawSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 3× replica of sf0.001 (deterministic: ScaleGen is xxhash-derived),
  // built once per suite run in scratch space.
  private lazy val big: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sf3x").toString
    ScaleGen.generate(spark, TestSpark.sf0001, dir, 3)
    dir
  }

  private val shuffled = new java.util.concurrent.atomic.AtomicLong
  private val listener = new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null)
        shuffled.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
  }

  /** Total records written to shuffles across ALL jobs the gate runs
    * (gates with internal localCheckpoint/collect span several jobs —
    * a single queryExecution's metrics would miss them). Listener
    * delivery is async: poll until the counter stabilizes. */
  private def shuffleRecords(name: String, dir: String): Long = {
    spark.sparkContext.addSparkListener(listener)
    try {
      shuffled.set(0L)
      SparkEntry.queries(name)(spark, dir).collect()
      var prev = -1L
      var cur = shuffled.get
      while (prev != cur) { Thread.sleep(250); prev = cur; cur = shuffled.get }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def law(name: String, maxRatio: Double): Unit =
    test(s"$name: shuffle records grow ≤ ×$maxRatio at ×3 data") {
      val small = shuffleRecords(name, TestSpark.sf0001)
      val large = shuffleRecords(name, big)
      // +20k absolute slack: at sf0.001 constant factors (bounded model
      // tables, AQE broadcast flips) dominate and pure ratios would be
      // meaningless for near-zero baselines.
      assert(large <= small * maxRatio + 20000,
        f"$name shuffled $small -> $large records at x3 data " +
          f"(x${large.toDouble / math.max(small, 1)}%.1f, bound x$maxRatio)")
    }

  // round-12/13 additions (the SCALE.md study set), linear plans
  law("q334_quality_classifier", 5.0)
  law("q335_compaction_plan", 5.0)
  law("q336_bitext_margin", 5.0) // bounded batch × pool — the fixed defect
  law("q338_t_closeness", 5.0)
  law("q339_filter_agreement", 5.0)
  law("q341_filter_funnel", 5.0)
  law("q342_score_calibration", 5.0)
  law("q343_dp_release", 5.0)
  law("q344_nfc_normalize", 5.0)
  law("q346_kcenter_coreset", 5.0)
  law("q347_source_cover", 5.0)
  law("q348_mst_clusters", 6.0) // log(cluster) rounds × linear edges
  law("q353_dendrogram_cut", 6.0) // one MST + per-cut CC over the tree
  law("q354_blocklist_scan", 5.0) // one automaton pass per row
  law("q355_stream_blocklist", 5.0) // streamed twin: stateless scan + bounded state
  law("q356_image_phash", 5.0) // per-row decode+DCT; only 8-byte hashes shuffle
  law("q349_kn_perplexity", 5.0)
  law("q350_source_ablation", 5.0)
  law("q351_embed_whitening", 5.0)
  law("q352_http_fetch", 5.0)
  // q345: replication-with-jitter densifies the fixed-ε 2-D plane, so
  // the ε-pair table itself grows ~quadratically (×9 at ×3) — the
  // WORKLOAD is super-linear by construction, not the plan (SCALE.md
  // round 12). The belt still catches anything beyond that law.
  law("q345_dbscan_grid", 12.0)
}
