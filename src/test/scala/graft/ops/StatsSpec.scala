package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the statistics / pattern gates
  * (q231–q240) at sf0.001 — an INDEPENDENT driver-side reimplementation
  * per gate (plain Scala over collected rows), so the distributed
  * two-phase forms are validated against something other than the
  * DuckDB oracle and on a different scale factor than the driver gate.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q231 Mann-Whitney matches a sort-based reference (ties, exact U)") {
    val rows = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "error"))
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    // reference: sort-and-walk average ranks
    val sorted = rows.sortBy(_._1)
    val n = sorted.length
    val avgRank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._1 == sorted(i)._1) j += 1
      val r = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => avgRank(k) = r)
      i = j
    }
    val na = rows.count(_._2 == "click")
    val nb = n - na
    val ra = sorted.zipWithIndex.collect {
      case ((_, "click"), k) => avgRank(k)
    }.sum
    val uRef = ra - na.toDouble * (na + 1) / 2.0
    val ties = sorted.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val sigma = math.sqrt(na.toDouble * nb *
      ((n + 1).toDouble - ties.toDouble / (n.toLong * (n - 1))) / 12.0)
    val zRef = (uRef - na.toDouble * nb / 2.0) / sigma
    val got = run("q231_mann_whitney").collect().head
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    assert(got.getDouble(2) == uRef, "U is exact arithmetic, must match exactly")
    assert(math.abs(got.getDouble(3) - zRef) < 1e-6)
  }

  test("q236 Spearman matches a sort-based reference within 1e-6") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double"), col("l_extendedprice"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val idx = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j < idx.length && idx(j)._1 == idx(i)._1) j += 1
        val r = (i + 1 + j).toDouble / 2.0
        (i until j).foreach(k => out(idx(k)._2) = r)
        i = j
      }
      out
    }
    val rx = avgRanks(rows.map(_._1))
    val ry = avgRanks(rows.map(_._2))
    val n = rows.length.toDouble
    val mx = rx.sum / n
    val my = ry.sum / n
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    val rhoRef = num / den
    val got = run("q236_spearman").collect().head
    assert(got.getLong(0) == rows.length.toLong)
    assert(math.abs(got.getDouble(1) - rhoRef) < 1e-6)
  }

  test("q234 TWAP matches a sequential per-user reference") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ref = evs.groupBy(_._1).collect {
      case (u, es) if es.length >= 2 =>
        val s = es.sortBy(e => (e._2, e._3))
        val span = (s.last._2 - s.head._2).toDouble / 1e6
        val area = s.sliding(2).map { case Array(p, c) =>
          // mirror the gate's round@9-then-exact-sum discipline
          BigDecimal(p._4 * ((c._2 - p._2).toDouble / 1e6))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        u -> (es.length.toLong, span, area.toDouble / span)
    }
    val got = run("q234_twap").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (u, (nRef, spanRef, twapRef)) =>
      val (n, span, twap) = got(u)
      assert(n == nRef, s"user $u n")
      assert(math.abs(span - spanRef) < 1e-5, s"user $u span")
      assert(math.abs(twap - twapRef) < 1e-5, s"user $u twap")
    }
  }

  test("q233 Bellman-Ford matches a dense 4-round reference relaxation") {
    val INF = 1000000000000000L
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).values.filter(_.length <= 20)
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { b =>
      val ps = b.map(_._2).sorted
      for (x <- ps.indices; y <- x + 1 until ps.length if ps(x) != ps(y))
        w((ps(x), ps(y))) = w.getOrElse((ps(x), ps(y)), 0L) + 1L
    }
    val edges = w.toSeq.filter(_._2 >= 2).flatMap { case ((a, b), c) =>
      val cost = 1000000L / c
      Seq((a, b, cost), (b, a, cost))
    }
    val parts = Tables.part(spark, sf).select("p_partkey").collect().map(_.getLong(0))
    var dist = parts.map(p => p -> (if (p % 37 == 0) 0L else INF)).toMap
    for (_ <- 1 to 4) {
      val relaxed = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => dist(e._1) + e._3).min
      }
      dist = dist.map { case (p, d0) =>
        p -> math.min(d0, relaxed.getOrElse(p, INF))
      }
    }
    val ref = dist.map { case (p, c) => p -> (if (c >= INF) -1L else c) }
    val got = run("q233_bounded_path").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("q240 greedy chain equals true subsequence existence per user") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(_._3).map(e => (e._2, e._3))
    }
    val types = evs.map(_._2).distinct.sorted
    // reference: direct subsequence search with STRICT ts increase
    def contains(seq: Array[(String, Long)], pat: Seq[String]): Boolean = {
      var lastTs = Long.MinValue
      var pi = 0
      seq.foreach { case (t, ts) =>
        if (pi < pat.length && t == pat(pi) && ts > lastTs) {
          // greedy over (type, strictly-later ts); equivalent to existence
          lastTs = ts; pi += 1
        }
      }
      pi == pat.length
    }
    val ref = (for (a <- types; b <- types; c <- types) yield {
      val sup = byUser.values.count(seq => contains(seq, Seq(a, b, c)))
      ((a, b, c), sup.toLong)
    }).filter(_._2 > 0).toMap
    val expected = ref.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(20)
    val got = run("q240_seq_patterns").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  test("q240 greedy reference helper is itself sound on a crafted trap") {
    // a-b-a-c: greedy earliest-first must still find (a, b, c) and
    // must NOT find (b, a, b)
    val seq = Array(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L))
    def greedy(pat: Seq[String]): Boolean = {
      var last = Long.MinValue
      pat.forall { p =>
        seq.find { case (t, ts) => t == p && ts > last } match {
          case Some((_, ts)) => last = ts; true
          case None => false
        }
      }
    }
    assert(greedy(Seq("a", "b", "c")))
    assert(greedy(Seq("b", "a", "c")))
    assert(!greedy(Seq("c", "a", "b")))
  }

  test("q239 covariance matches a driver-side reference") {
    val vs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vs.length.toDouble
    val got = run("q239_embed_covariance").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (i <- 1 to 8; j <- i to 8) {
      val xs = vs.map(_(i - 1))
      val ys = vs.map(_(j - 1))
      val ref = (xs.zip(ys).map { case (a, b) => a * b }.sum -
        xs.sum * ys.sum / n) / n
      assert(math.abs(got((i, j)) - ref) < 1e-5, s"cov($i,$j)")
    }
  }

  test("q232 OOF encoding excludes its own fold (leakage check)") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), pmod(col("o_orderkey"), lit(5)).cast("int"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val got = run("q232_target_encoding").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    got.foreach { case ((seg, fold), (nOof, enc)) =>
      val oof = rows.filter(r => r._1 == seg && r._2 != fold)
      assert(oof.length.toLong == nOof, s"($seg,$fold) n_oof")
      val ref = (oof.map(_._3).sum / oof.length).toDouble
      assert(math.abs(enc - ref) < 1e-5, s"($seg,$fold) enc")
    }
  }

  test("q241 streamed TWAP's final row per user equals batch q234") {
    val stream = run("q241_stream_twap").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> rows.maxBy(_.getLong(2)).getDouble(3)
      }
    val batch = run("q234_twap").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(stream.keySet == batch.keySet)
    stream.foreach { case (u, t) =>
      assert(t == batch(u), s"user $u: stream-final $t vs batch ${batch(u)}")
    }
  }

  test("q242 weighted median matches a sort-and-walk reference") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val ref = rows.groupBy(_._1).map { case (g, es) =>
      val sorted = es.sortBy(_._2)
      val wtot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { e => cum += e._3; 2 * cum >= wtot }.get._2
      g -> (wtot, med)
    }
    val got = run("q242_weighted_median").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == ref)
  }

  test("q243 weighted sample is deterministic and length-biased") {
    val a = run("q243_weighted_sample").collect().map(_.getLong(0)).toSeq
    val b = run("q243_weighted_sample").collect().map(_.getLong(0)).toSeq
    assert(a == b, "same corpus, same sample")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meanAll = docs.values.sum.toDouble / docs.size
    val meanSampled = a.map(docs).sum.toDouble / a.size
    assert(meanSampled > meanAll,
      s"inclusion odds ∝ length: sampled mean $meanSampled vs corpus $meanAll")
  }

  test("q244 Gini matches a sort-based reference and sits in [0,1)") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val ref = rows.groupBy(_._1).map { case (seg, es) =>
      val spend = es.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._3).sum }
        .toSeq.sortBy { case (c, x) => (x, c) }
      val n = spend.length
      val s0 = spend.map(_._2).sum.toDouble
      val s1 = spend.zipWithIndex.map { case ((_, x), i) =>
        x.toDouble * (i + 1) }.sum
      seg -> (2.0 * s1 - (n + 1) * s0) / (n * s0)
    }
    val got = run("q244_gini_concentration").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (seg, g) =>
      assert(math.abs(g - ref(seg)) < 1e-6, s"$seg gini")
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("q247 Kaplan-Meier matches a sequential product-limit reference") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tmax = evs.map(_._3).max
    val spells = evs.groupBy(_._1).flatMap { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val t0 = views.min
        val purch = es.filter(e => e._2 == "purchase" && e._3 > t0).map(_._3)
        if (purch.isEmpty) Some(((tmax - t0) / 1000000L, 0))
        else Some(((purch.min - t0) / 1000000L, 1))
      }
    }.toSeq
    val n = spells.size
    val byDur = spells.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = n.toLong
    var s = 1.0
    val ref = byDur.flatMap { case (dur, es) =>
      val d = es.count(_._2 == 1).toLong
      val out = if (d > 0) {
        s *= 1.0 - d.toDouble / atRisk
        Some(dur -> (d, es.size.toLong - d, atRisk, s))
      } else None
      atRisk -= es.size
      out
    }.toMap
    val got = run("q247_kaplan_meier").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet == ref.keySet)
    var prev = 1.0
    got.toSeq.sortBy(_._1).foreach { case (dur, (d, c, nr, surv)) =>
      val (dRef, cRef, nrRef, sRef) = ref(dur)
      assert(d == dRef && c == cRef && nr == nrRef, s"counts at $dur")
      assert(math.abs(surv - sRef) < 1e-5, s"surv at $dur: $surv vs $sRef")
      assert(surv <= prev + 1e-9, "survival is non-increasing")
      prev = surv
    }
  }

  test("q249 prefix-min identity equals a literal sequential clamp loop") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
        r.getInt(3).toLong, r.getLong(4),
        if (r.getLong(2) % 2 == 0) r.getLong(5) else -r.getLong(5)))
    val ref = rows.groupBy(_._1).map { case (sk, es) =>
      // the gate's total pre-order: ties are full-tuple-identical moves
      val sorted = es.sortBy(e => (e._2, e._3, e._4, e._5, e._6))
      var b = 0L; var peak = 0L; var lost = 0L
      sorted.foreach { e =>
        val delta = e._6
        b = math.max(0L, b + delta) // the literal sequential clamp
        if (b == 0L && delta < 0L) lost += 1
        peak = math.max(peak, b)
      }
      sk -> (sorted.length.toLong, peak, lost, b)
    }
    val got = run("q249_clamped_balance").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == ref)
  }

  test("q248 log-rank matches a sequential reference walk") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tmax = evs.map(_._3).max
    val spells = evs.groupBy(_._1).flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val t0 = views.min
        val purch = es.filter(e => e._2 == "purchase" && e._3 > t0).map(_._3)
        val (dur, death) =
          if (purch.isEmpty) ((tmax - t0) / 1000000L, 0L)
          else ((purch.min - t0) / 1000000L, 1L)
        Some((dur, death, u % 2))
      }
    }.toSeq
    var nr = spells.size.toLong
    var nr1 = spells.map(_._3).sum
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    spells.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, es) =>
      val d = es.map(_._2).sum
      if (d > 0) {
        o1 += es.filter(_._2 == 1L).map(_._3).sum
        e1 += d.toDouble * nr1 / nr
        if (nr > 1)
          v += d.toDouble * (nr1.toDouble / nr) * (1.0 - nr1.toDouble / nr) *
            ((nr - d).toDouble / (nr - 1))
      }
      nr -= es.size
      nr1 -= es.map(_._3).sum
    }
    val chi2 = (o1 - e1) * (o1 - e1) / v
    val got = run("q248_logrank").collect().head
    assert(got.getLong(0) == o1)
    assert(math.abs(got.getDouble(1) - e1) < 1e-5)
    assert(math.abs(got.getDouble(2) - chi2) < 1e-4)
  }

  test("q250 rank movers match a sort-based two-period reference") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), year(col("l_shipdate")), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 100)))
    def rankOf(period: Boolean): Map[Long, Long] = {
      val rev = rows.filter(r => (r._2 < 1998) == period)
        .groupBy(_._1).map { case (pk, es) => pk -> es.map(_._3).sum }
      rev.toSeq.sortBy { case (pk, rc) => (-rc, pk) }
        .zipWithIndex.map { case ((pk, _), i) => pk -> (i + 1).toLong }.toMap
    }
    val (ra, rb) = (rankOf(true), rankOf(false))
    val expected = (ra.keySet & rb.keySet).toSeq
      .map(pk => (pk, ra(pk), rb(pk), ra(pk) - rb(pk)))
      .sortBy { case (pk, _, _, dl) => (-math.abs(dl), pk) }.take(20)
    val got = run("q250_rank_movers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q251 Heaps fit matches a driver-side log-log OLS on the same curve") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val cs = Iterator.iterate(50)(_ * 2).takeWhile(_ <= docs.length).toSeq
    def grams(t: String): Seq[String] =
      t.split(" ", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSeq
    val curve = cs.map { c =>
      val head = docs.take(c)
      val n = head.map(d => grams(d._2).size).sum.toDouble
      val v = head.flatMap(d => grams(d._2)).distinct.size.toDouble
      (math.log(n), math.log(v))
    }
    val np = curve.length.toDouble
    val sx = curve.map(_._1).sum; val sy = curve.map(_._2).sum
    val sxy = curve.map(p => p._1 * p._2).sum
    val sxx = curve.map(p => p._1 * p._1).sum
    val beta = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val lnk = sy / np - beta * (sx / np)
    val got = run("q251_heaps_law").collect().head
    assert(got.getLong(0) == cs.length.toLong)
    assert(math.abs(got.getDouble(1) - beta) < 1e-4, s"beta ${got.getDouble(1)} vs $beta")
    assert(math.abs(got.getDouble(2) - lnk) < 1e-3)
    assert(got.getDouble(1) > 0.0 && got.getDouble(1) < 1.0,
      "Heaps exponent lives in (0,1)")
  }

  test("q253 sweep area equals direct duration sum and peak matches brute force") {
    val r = run("q253_littles_law").collect().head
    assert(r.getLong(3) == r.getLong(4), "Fubini: sum_dur_s == sweep_area_s")
    assert(r.getDouble(5) == r.getDouble(6), "L == lambda*W")
    // brute-force peak concurrency from the same session definition
    val sess = Relational.withSessionIds(Tables.events(spark, sf))
      .groupBy("user_id", "session_id")
      .agg(min(unix_micros(col("ts"))).as("st"),
        max(unix_micros(col("ts"))).as("en"))
      .collect().map(x => (x.getLong(2), x.getLong(3)))
    val pts = sess.flatMap { case (st, en) => Seq((st, 1), (en, -1)) }
      .sortBy { case (t, dl) => (t, -dl) }
    var c = 0; var peak = 0
    pts.foreach { p => c += p._2; peak = math.max(peak, c) }
    assert(r.getLong(1) == peak.toLong, s"peak ${r.getLong(1)} vs $peak")
  }

  test("q254 Welch t matches a driver-side reference") {
    val rows = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "error"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def stats(g: String) = {
      val vs = rows.filter(_._1 == g).map(_._2)
      val n = vs.length
      val m = vs.sum / n
      val va = vs.map(v => (v - m) * (v - m)).sum / (n - 1)
      (n, m, va / n)
    }
    val (n1, m1, s1) = stats("click")
    val (n2, m2, s2) = stats("error")
    val tRef = (m1 - m2) / math.sqrt(s1 + s2)
    val dfRef = (s1 + s2) * (s1 + s2) /
      (s1 * s1 / (n1 - 1) + s2 * s2 / (n2 - 1))
    val got = run("q254_welch_t").collect().head
    assert(got.getLong(0) == n1.toLong && got.getLong(1) == n2.toLong)
    assert(math.abs(got.getDouble(3) - tRef) < 1e-5)
    assert(math.abs(got.getDouble(4) - dfRef) < 1e-2)
  }

  test("q256 ANOVA F matches a driver-side reference") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = rows.length
    val k = groups.size
    val gm = rows.map(_._2).sum / n
    val ssb = groups.values.map { vs =>
      val m = vs.sum / vs.length; vs.length * (m - gm) * (m - gm) }.sum
    val ssw = groups.values.flatMap { vs =>
      val m = vs.sum / vs.length; vs.map(v => (v - m) * (v - m)) }.sum
    val fRef = (ssb / (k - 1)) / (ssw / (n - k))
    val got = run("q256_anova_f").collect().head
    assert(got.getLong(0) == k.toLong && got.getLong(1) == n.toLong)
    assert(math.abs(got.getDouble(4) - fRef) < 1e-3, s"F ${got.getDouble(4)} vs $fRef")
    val eta2Ref = ssb / (ssb + ssw)
    assert(math.abs(got.getDouble(5) - eta2Ref) < 1e-4)
  }

  test("q255 ACF matches a driver-side reference and lag-0 normalization") {
    val hourly = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = hourly.values.sum.toDouble / hourly.size
    val den = hourly.values.map(c => (c - m) * (c - m)).sum
    val got = run("q255_acf").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (1L to 6L).foreach { k =>
      val pairs = hourly.keys.toSeq.filter(h => hourly.contains(h + k))
      val num = pairs.map(h => (hourly(h) - m) * (hourly(h + k) - m)).sum
      val (np, acf) = got(k)
      assert(np == pairs.size.toLong, s"lag $k pairs")
      assert(math.abs(acf - num / den) < 1e-5, s"lag $k acf")
      assert(acf.abs <= 1.0 + 1e-9)
    }
  }

  test("q272 Wilson interval brackets p-hat inside [0,1]") {
    run("q272_wilson_ci").collect().foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"interval [$lo,$hi] vs $p")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
      assert(hi - lo < 1.0)
    }
  }

  test("q273 Neyman allocation sums exactly to the budget") {
    val rows = run("q273_neyman_allocation").collect()
    assert(rows.map(_.getLong(3)).sum == 1000L)
    assert(rows.forall(_.getLong(3) >= 0L))
  }

  test("q275 the ALL stratum is by definition not reversed") {
    val rows = run("q275_simpson_audit").collect()
    val all = rows.find(_.getString(0) == "ALL").get
    assert(!all.getBoolean(4))
  }

  test("q274 Sidak flags are a subset of naive flags") {
    val rows = run("q274_ks_significance").collect()
    rows.foreach { r =>
      if (r.getBoolean(6)) assert(r.getBoolean(5), "sidak implies naive")
    }
    assert(rows.length == 190)
  }

  test("q280 raked weights drive source margins toward uniform") {
    val rows = run("q280_raking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nTot = rows.map(_._3).sum.toDouble
    val nSrc = rows.map(_._1).distinct.length
    val raw = rows.groupBy(_._1).map { case (_, cs) =>
      math.abs(cs.map(_._3).sum / nTot - 1.0 / nSrc) }.max
    val raked = rows.groupBy(_._1).map { case (_, cs) =>
      math.abs(cs.map(c => c._4 * c._3).sum / nTot - 1.0 / nSrc) }.max
    // this corpus's raw source margin may already be exactly uniform —
    // require strict tightening only when there is slack to tighten
    if (raw > 0.01)
      assert(raked < raw, s"raking must tighten the source margin: $raked vs $raw")
    assert(raked < 0.01, s"3 rounds should land near uniform, off by $raked")
    val nLang = rows.map(_._2).distinct.length
    val rakedLang = rows.groupBy(_._2).map { case (_, cs) =>
      math.abs(cs.map(c => c._4 * c._3).sum / nTot - 1.0 / nLang) }.max
    assert(rakedLang < 1e-6, "the last scaling step hits the lang margin exactly")
    assert(rows.forall(_._4 > 0.0))
  }

  test("q281 geometric median beats the mean on total distance") {
    val pts = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map { r => val e = r.getSeq[Float](0); (e(0).toDouble, e(1).toDouble) }
    val r = run("q281_geometric_median").collect().head
    val (gx, gy) = (r.getDouble(1), r.getDouble(2))
    def totalDist(cx: Double, cy: Double) = pts.map { case (x, y) =>
      math.hypot(x - cx, y - cy) }.sum
    val mx = pts.map(_._1).sum / pts.length
    val my = pts.map(_._2).sum / pts.length
    assert(totalDist(gx, gy) <= totalDist(mx, my) + 1e-9,
      "Weiszfeld iterate must not be worse than the mean start")
    assert(math.abs(r.getDouble(3) - totalDist(gx, gy) / pts.length) < 1e-4)
  }

  test("q235 entropy-l never exceeds distinct-l and both bound 1") {
    val rows = run("q235_l_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getLong(3)
      val el = r.getDouble(4)
      assert(l >= 1L && el >= 1.0 - 1e-9)
      assert(el <= l.toDouble + 1e-6, "exp(H) <= #distinct values")
      assert(r.getBoolean(5) == (l < 3))
    }
  }
}
