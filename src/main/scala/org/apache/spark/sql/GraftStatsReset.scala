package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Stats-boundary rewrap for materialized (checkpointed) frames — the
  * one place graft reaches into `private[sql]` internals, which is why
  * this object lives in the `org.apache.spark.sql` package.
  *
  * Why it exists: `Dataset.localCheckpoint()/checkpoint()` truncate
  * LINEAGE but deliberately carry the origin plan's ESTIMATED
  * `Statistics` onto the new `LogicalRDD` leaf
  * (`LogicalRDD.fromDataset`), so downstream join-strategy estimates
  * keep working. For ITERATIVE algorithms that is a time bomb: each
  * round's estimate is a PRODUCT over the previous round's leaf
  * estimates (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`), so the
  * carried sizeInBytes grows multiplicatively per round — a few joins
  * per round means the BigInt's BIT LENGTH grows geometrically, and
  * after ~10 rounds of a loop with a nested loop (Borůvka's per-round
  * merge-graph CC) the planner spends MINUTES in Karatsuba/Toom-Cook
  * multiplication just to conclude "it's big" (observed: q358's MST on
  * the ε-graph wedged the driver in `BigInteger.multiply` before its
  * first real job; the 3–4-round dup-graph MSTs never got big enough
  * to notice).
  *
  * The fix, applied by [[graft.Materialize]] after every eager
  * checkpoint: rebuild the leaf over the SAME pinned `InternalRow` RDD
  * (no row conversion, no new job — `queryExecution.toRdd` of an
  * already-checkpointed frame is the pinned blocks) with the origin
  * estimate CAPPED at 2^50 bytes (1 PiB). Below the cap, estimates —
  * and thus static broadcast decisions — are preserved exactly; above
  * it, the estimate saturates, which only ever affects plans where the
  * number had long stopped meaning anything physical. AQE re-plans
  * from MEASURED shuffle sizes at runtime either way. */
object GraftStatsReset {
  private val Cap: BigInt = BigInt(1) << 50

  def apply(cp: DataFrame): DataFrame = {
    val ds = cp.asInstanceOf[CDataset[Row]]
    val qe = ds.queryExecution
    val est = qe.optimizedPlan.stats.sizeInBytes
    if (est <= Cap) cp // estimate is sane — keep the original leaf
    else {
      val (part, ord) = qe.optimizedPlan match {
        case l: LogicalRDD => (l.outputPartitioning, l.outputOrdering)
        case _ => (UnknownPartitioning(0), Nil)
      }
      CDataset.ofRows(ds.sparkSession,
        LogicalRDD(qe.analyzed.output, qe.toRdd, part, ord,
          isStreaming = false, None)(
          ds.sparkSession, Some(Statistics(sizeInBytes = Cap)), None))
    }
  }
}
