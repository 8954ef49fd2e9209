package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The interval-join rewrite: a natural BETWEEN join with no equi-key
  * must plan as a bucketed equality join (rule on) yet return exactly
  * the nested-loop join's rows (rule off), including every boundary
  * case the bucketization could get wrong. */
class IntervalJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 30L * 60 * 1000000 // rule default: 30-min buckets

  private def ts(micros: Long) = new java.sql.Timestamp(micros / 1000)

  // points at bucket edges, interior, and far outside; intervals
  // spanning 0, 1 and 3 buckets, one exactly bucket-aligned, one
  // degenerate (hi < lo) and one empty-match
  private lazy val points = Seq(
    0L, 1L, W - 1, W, W + 1, 2 * W, 5 * W + 17, 10 * W
  ).map(m => Tuple1(ts(m))).toDF("ts")
  private lazy val intervals = Seq(
    (ts(0L), ts(0L)),             // single instant at bucket edge
    (ts(1L), ts(W - 1)),          // inside one bucket
    (ts(W - 1), ts(W + 1)),       // straddles an edge
    (ts(0L), ts(3 * W)),          // spans 4 buckets, aligned ends
    (ts(5 * W), ts(6 * W - 1)),   // contains the interior point
    (ts(8 * W), ts(7 * W)),       // degenerate: hi < lo, matches nothing
    (ts(20 * W), ts(21 * W))      // matches nothing
  ).toDF("lo", "hi")

  private def joined(): DataFrame =
    points.join(intervals, col("ts") >= col("lo") && col("ts") <= col("hi"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("rewritten plan is an equality join; rows equal the nested-loop result") {
    val withRule = joined()
    val p = withRule.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rule must produce an equality-shaped join:\n$p")
    assert(p.contains("graft_bucket"), s"expected the generated bucket key:\n$p")

    val key = "spark.graft.intervalJoin.enabled"
    spark.conf.set(key, "false")
    val reference = try canon(joined()) finally spark.conf.unset(key)
    assert(canon(withRule) == reference, "rewrite must not change results")
    assert(reference.nonEmpty, "fixture must produce matches")
  }

  test("rule leaves equi-keyed interval joins alone (the author's bucketization choice)") {
    val p2 = points.withColumn("k", lit(1))
    val i2 = intervals.withColumn("k", lit(1))
    val p = p2.join(i2, p2("k") === i2("k") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bucket"), s"equi-keyed join must not be rewritten:\n$p")
  }

  test("rule is inert for non-timestamp bounds and non-inner joins") {
    val a = Seq(1L, 5L, 9L).toDF("x")
    val b = Seq((0L, 4L), (6L, 10L)).toDF("l", "h")
    val p = a.join(b, col("x") >= col("l") && col("x") <= col("h"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bucket"), s"long-typed bounds stay untouched:\n$p")
    val po = points.join(intervals,
        col("ts") >= col("lo") && col("ts") <= col("hi"), "left")
      .queryExecution.optimizedPlan.toString
    assert(!po.contains("graft_bucket"), s"outer joins stay untouched:\n$po")
  }

  test("SQL BETWEEN syntax is rewritten too (parser lowers it to the bound pair)") {
    points.createOrReplaceTempView("g_pts")
    intervals.createOrReplaceTempView("g_ivs")
    val df = spark.sql(
      "SELECT * FROM g_pts JOIN g_ivs ON g_pts.ts BETWEEN g_ivs.lo AND g_ivs.hi")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_bucket"), s"BETWEEN must hit the rule:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested loop:\n$p")
    val key = "spark.graft.intervalJoin.enabled"
    spark.conf.set(key, "false")
    val want = try canon(spark.sql(
      "SELECT * FROM g_pts JOIN g_ivs ON g_pts.ts BETWEEN g_ivs.lo AND g_ivs.hi"))
      finally spark.conf.unset(key)
    assert(canon(df) == want)
  }

  test("orientation flip: intervals on the left, points on the right — same rewrite, same rows") {
    val flipped = intervals.join(points,
      col("ts") >= col("lo") && col("ts") <= col("hi"))
    val p = flipped.queryExecution.executedPlan.toString
    assert(p.contains("graft_bucket") && !p.contains("BroadcastNestedLoopJoin"),
      s"rule must fire with the interval side on the left:\n$p")
    val key = "spark.graft.intervalJoin.enabled"
    spark.conf.set(key, "false")
    val want = try canon(intervals.join(points,
      col("ts") >= col("lo") && col("ts") <= col("hi"))) finally spark.conf.unset(key)
    assert(canon(flipped) == want)
  }

  test("extra cross-side predicates survive as join filters") {
    // a residual non-equi conjunct beyond the bounds must be preserved
    // verbatim — the rewrite keeps the WHOLE original condition
    val p2 = points.withColumn("w", expr("unix_micros(ts) % 7"))
    val i2 = intervals.withColumn("z", expr("unix_micros(lo) % 5"))
    def run() = p2.join(i2,
      col("ts") >= col("lo") && col("ts") <= col("hi") && col("w") > col("z"))
    val withRule = run()
    assert(withRule.queryExecution.executedPlan.toString.contains("graft_bucket"))
    val key = "spark.graft.intervalJoin.enabled"
    spark.conf.set(key, "false")
    val want = try canon(run()) finally spark.conf.unset(key)
    assert(canon(withRule) == want)
    assert(want.nonEmpty, "fixture must keep some rows through the residual predicate")
  }

  test("randomized: rewritten join equals nested-loop on arbitrary data") {
    val rnd = new scala.util.Random(31)
    val pts = Seq.fill(300)(Tuple1(ts(rnd.nextLong(10 * W)))).toDF("ts")
    val ivs = Seq.fill(60) {
      val a = rnd.nextLong(10 * W); val b = rnd.nextLong(10 * W)
      (ts(a), ts(b)) // ~half degenerate hi < lo — must match nothing
    }.toDF("lo", "hi")
    def run() = pts.join(ivs, col("ts") >= col("lo") && col("ts") <= col("hi"))
    val got = canon(run())
    val key = "spark.graft.intervalJoin.enabled"
    spark.conf.set(key, "false")
    val want = try canon(run()) finally spark.conf.unset(key)
    assert(got == want)
  }
}
