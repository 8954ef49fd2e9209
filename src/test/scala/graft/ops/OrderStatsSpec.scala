package graft.ops

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The distributed selection algorithm against sorted-array truth:
  * random data with duplicates/negatives, degenerate constant columns,
  * both median parities, and agreement with Spark's own percentile. */
class OrderStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selectKth equals the sorted reference on random data (dups, negatives)") {
    val rnd = new scala.util.Random(61)
    for (round <- 1 to 3) {
      val n = 500 + rnd.nextInt(500)
      val data = Seq.fill(n)(math.rint(rnd.nextGaussian() * 100) / 4.0 - 50)
      val df = data.toDF("x")
      val sorted = data.sorted
      // force the iterative path with a tiny exactThreshold
      for (k <- Seq(1, n / 3, n / 2, n - 1, n)) {
        val got = OrderStats.selectKth(df, col("x"), k, buckets = 16,
          exactThreshold = 8)
        assert(got == sorted(k - 1), s"round $round k=$k")
      }
    }
  }

  test("values sitting exactly on bucket boundaries survive deep refinement") {
    // every value is an exact multiple of the first-round bucket width,
    // maximizing the float-rounding boundary traffic the clamp guards
    // (an unclamped round-2 bucket of -1 would silently drop rows)
    val n = 256
    val data = (0 until n).map(i => i * 0.1)
    val df = data.toDF("x")
    val sorted = data.sorted
    for (k <- Seq(1, 2, n / 2, n - 1, n)) {
      val got = OrderStats.selectKth(df, col("x"), k, buckets = 16,
        exactThreshold = 4)
      assert(got == sorted(k - 1), s"k=$k")
    }
  }

  test("constant and two-value columns terminate and select correctly") {
    val const = Seq.fill(100)(7.25).toDF("x")
    assert(OrderStats.selectKth(const, col("x"), 50, buckets = 8,
      exactThreshold = 4) == 7.25)
    val two = (Seq.fill(60)(1.0) ++ Seq.fill(40)(2.0)).toDF("x")
    assert(OrderStats.selectKth(two, col("x"), 60, buckets = 8,
      exactThreshold = 4) == 1.0)
    assert(OrderStats.selectKth(two, col("x"), 61, buckets = 8,
      exactThreshold = 4) == 2.0)
  }

  test("degenerate ulp-scale ranges resolve to a CORPUS value, not a boundary") {
    // two distinct doubles one ulp apart: every bucket width underflows
    // to 0 immediately after the first descent, so the degenerate exit
    // must pick among the surviving values exactly — returning the
    // refined range's lo (a computed boundary) would fabricate a value
    val a = 1.0
    val b = java.lang.Math.nextUp(a)
    val data = Seq.fill(30)(a) ++ Seq.fill(20)(b)
    val df = data.toDF("x")
    assert(OrderStats.selectKth(df, col("x"), 30, buckets = 8,
      exactThreshold = 4) == a)
    assert(OrderStats.selectKth(df, col("x"), 31, buckets = 8,
      exactThreshold = 4) == b)
  }

  test("empty input and out-of-range ranks fail with clear errors, not NPE") {
    val empty = Seq.empty[Double].toDF("x")
    val e1 = intercept[IllegalArgumentException] {
      OrderStats.selectKth(empty, col("x"), 1)
    }
    assert(e1.getMessage.contains("empty"))
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val e2 = intercept[IllegalArgumentException] {
      OrderStats.selectKth(df, col("x"), 4, buckets = 8, exactThreshold = 1)
    }
    assert(e2.getMessage.contains("exceeds"))
    intercept[IllegalArgumentException] {
      OrderStats.selectKth(df, col("x"), 0)
    }
  }

  test("grouped quantiles survive ulp-boundary groups (full-range fallback)") {
    // group F sits entirely within a few ulps: per-group width
    // underflows and any boundary fuzz must route to the exact
    // fallback rather than dropping F or inventing a value
    val a = 123.456
    val vals = Iterator.iterate(a)(java.lang.Math.nextUp).take(5).toSeq
    val rows = vals.flatMap(v => Seq.fill(200)(("F", v))) ++
      (1 to 5000).map(i => ("G", i.toDouble))
    val df = rows.toDF("g", "v").repartition(7)
    val got = OrderStats
      .quantileDiscByGroup(df, col("g"), col("v"), 0.5,
        buckets = 16, exactThreshold = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val truthF = vals.flatMap(v => Seq.fill(200)(v)).sorted.apply(499)
    assert(got("F") == truthF)
    assert(got("G") == 2500.0)
  }

  test("exactMedian handles both parities like quantile_cont") {
    val odd = Seq(5.0, 1.0, 3.0).toDF("x")
    assert(OrderStats.exactMedian(odd, col("x")) == ((3L, 3.0)))
    val even = Seq(4.0, 1.0, 3.0, 2.0).toDF("x")
    assert(OrderStats.exactMedian(even, col("x")) == ((4L, 2.5)))
  }

  test("refinement median equals Spark's percentile aggregate on lineitem") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val (_, m) = OrderStats.exactMedian(li, col("l_extendedprice"))
    val want = li.select(expr("percentile(l_extendedprice, 0.5)")).first().getDouble(0)
    assert(math.abs(m - want) < 1e-9)
  }

  test("quantileDiscByGroup equals the sorted-array truth under hostile shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // group A: large continuous; B: heavy duplicates (forces boundary
    // ties); C: all-equal (width-underflow branch); D: tiny (straight
    // to the exact pass); E: negatives
    val rows =
      (1 to 20000).map(_ => ("A", rnd.nextDouble() * 1e4)) ++
      (1 to 15000).map(_ => ("B", (rnd.nextInt(7) * 10).toDouble)) ++
      (1 to 5000).map(_ => ("C", 42.0)) ++
      (1 to 9).map(i => ("D", i.toDouble)) ++
      (1 to 12000).map(_ => ("E", -rnd.nextDouble() * 1e3))
    val df = rows.toDF("g", "v").repartition(13)
    for (p <- Seq(0.5, 0.9, 0.01)) {
      val got = OrderStats
        .quantileDiscByGroup(df, col("g"), col("v"), p,
          buckets = 32, exactThreshold = 64)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val truth = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        val k = math.max(1L, math.ceil(p * sorted.length).toLong)
        g -> ((sorted.length.toLong, sorted((k - 1).toInt)))
      }
      assert(got == truth, s"p=$p")
    }
  }

  test("selectKths equals selectKth rank-for-rank (random, dups, edge ranks)") {
    val rnd = new scala.util.Random(202)
    for (round <- 1 to 3) {
      val n = 800 + rnd.nextInt(400)
      val data = Seq.fill(n)(math.rint(rnd.nextGaussian() * 100) / 4.0 - 50)
      val df = data.toDF("x")
      val sorted = data.sorted
      val ks = Seq(1L, n / 7L max 1L, n / 3L, n / 2L, n - 1L, n.toLong,
        n / 2L) // duplicate rank on purpose
      val got = OrderStats.selectKths(df, col("x"), ks,
        buckets = 16, exactThreshold = 8)
      ks.distinct.foreach { k =>
        assert(got(k) == sorted(k.toInt - 1), s"round $round k=$k")
      }
    }
  }

  test("selectKths survives constant columns and boundary-heavy data") {
    val const = Seq.fill(300)(7.25).toDF("x")
    val gotC = OrderStats.selectKths(const, col("x"), Seq(1L, 150L, 300L),
      buckets = 8, exactThreshold = 4)
    assert(gotC.values.forall(_ == 7.25))
    // values exactly on bucket boundaries of [0, 16] with 16 buckets
    val data = (0 to 16).flatMap(i => Seq.fill(20)(i.toDouble))
    val df = data.toDF("x")
    val sorted = data.sorted
    val ks = Seq(1L, 100L, 170L, 340L)
    val got = OrderStats.selectKths(df, col("x"), ks,
      buckets = 16, exactThreshold = 8)
    ks.foreach(k => assert(got(k) == sorted(k.toInt - 1), s"k=$k"))
  }
}
