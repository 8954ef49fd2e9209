package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a sort — the scale answer to q61's
  * documented trade ("exact percentiles require a per-group sort: use
  * the sketch instead"). The k-th smallest of N values is found by
  * ITERATIVE RANGE REFINEMENT (the classic distributed selection
  * algorithm): bucket the current [lo, hi] range into B equal slices,
  * count per slice in ONE narrow aggregation (B result rows — the
  * driver touch is O(B) per round, the kmeansCentroids class), descend
  * into the slice containing rank k, repeat. Each round shrinks the
  * candidate set ~B×, so a 100 TB column needs ~log_B(N) ≈ 4–5 full
  * scans of ONE column (pruned, pushdown-friendly) and never sorts,
  * shuffles, or materializes more than B counters — vs the percentile
  * aggregate's per-group value buffer, which at 100 TB is the corpus.
  *
  * The final small slice (≤ `exactThreshold` rows) resolves exactly
  * with TakeOrderedAndProject — per-partition heaps of a bounded set.
  */
object OrderStats {

  /** The k-th smallest value (1-based rank) of `c` over `df`. */
  def selectKth(df: DataFrame, c: Column, k: Long,
                buckets: Int = 1024, exactThreshold: Long = 65536): Double = {
    val vals = df.select(c.cast("double").as("v")).where(col("v").isNotNull)
    var bounds = vals.agg(min(col("v")), max(col("v"))).first()
    var lo = bounds.getDouble(0)
    var hi = bounds.getDouble(1)
    var need = k
    var scope = vals
    var n = -1L
    while (n < 0 || n > exactThreshold) {
      if (lo == hi) return lo
      val width = (hi - lo) / buckets
      // adversarial guard: a range of a few ulps underflows the bucket
      // width to 0 — every surviving value is then equal at double
      // resolution and the k-th of them IS that value
      if (width == 0.0) return lo
      // clamp BOTH sides: hi itself lands in the last bucket, and a
      // round-2 survivor can sit a float-rounding hair BELOW the new lo
      // (its previous-round floor rounded up across the boundary) —
      // unclamped it would bucket to -1 and vanish from the rank scan
      val b = greatest(
        least(floor((col("v") - lit(lo)) / lit(width)), lit(buckets - 1)),
        lit(0))
      val counts = scope.groupBy(b.cast("int").as("b"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var acc = 0L
      var chosen = -1
      var i = 0
      while (chosen < 0 && i < buckets) {
        val cn = counts.getOrElse(i, 0L)
        if (acc + cn >= need) chosen = i else acc += cn
        i += 1
      }
      need -= acc
      val newLo = lo + chosen * width
      val newHi = if (chosen == buckets - 1) hi else lo + (chosen + 1) * width
      // the descend filter mirrors the bucket assignment EXACTLY (same
      // clamped floor arithmetic), so the slice row set equals the
      // counted set
      scope = scope.where(b.cast("int") === chosen)
      lo = newLo; hi = newHi
      n = counts.getOrElse(chosen, 0L)
    }
    scope.orderBy("v").limit(need.toInt) // TakeOrderedAndProject: bounded heap
      .orderBy(col("v").desc).limit(1).first().getDouble(0)
  }

  /** Exact interpolated median (quantile_cont 0.5 semantics): odd N →
    * the middle value; even N → the mean of the two middle values. */
  def exactMedian(df: DataFrame, c: Column): (Long, Double) = {
    val n = df.select(c).where(c.isNotNull).count()
    require(n > 0, "median of an empty column")
    if (n % 2 == 1) (n, selectKth(df, c, n / 2 + 1))
    else (n, (selectKth(df, c, n / 2) + selectKth(df, c, n / 2 + 1)) / 2.0)
  }

  val defs: Seq[QueryDef] = Seq(
    // Exact median of a continuous 600k-value column through the
    // refinement path (never a sort, never a value buffer); oracle =
    // DuckDB's quantile_cont. Rounded at 5 dp: the interpolated mean
    // of two doubles is exact, the round guards the literal formatting.
    QueryDef("q113_exact_median",
      (s, d) => {
        val (n, m) = exactMedian(Tables.lineitem(s, d), col("l_extendedprice"))
        import s.implicits._
        Seq((n, math.rint(m * 1e5) / 1e5)).toDF("n_rows", "median")
      },
      Some("""SELECT COUNT(l_extendedprice) AS n_rows,
             |  round(quantile_cont(l_extendedprice, 0.5), 5) AS median
             |FROM lineitem""".stripMargin))
  )
}
