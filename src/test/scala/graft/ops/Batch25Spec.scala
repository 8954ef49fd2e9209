package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side SEQUENTIAL cross-checks for the r15 dendrogram readout
  * gates at sf0.001 — the Batch23 pattern (a different algorithm on
  * collected data must reproduce the distributed result exactly):
  *
  *  - q364: Kruskal union-find (vs distributed Borůvka) elects the
  *    (w, a, b)-unique mutual-reachability MST, then a plain recursive
  *    DFS with cyclic-after-parent child order (vs Euler tour + Wyllie
  *    list ranking) must reproduce every position and reachability;
  *  - q363: per-cut union-find connectivity (vs the level-encoded
  *    contraction CC scaffold) re-derives each pair's discretized
  *    cophenetic level, and exact BigInt moments re-derive CPCC. */
class Batch25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001
  private val cuts = Seq(0.0004, 0.000625, 0.0016, 0.0025)

  private def pts2d = Tables.embeddings(spark, dir).select(
    col("vec_id").as("id"),
    element_at(col("embedding"), 1).cast("double").as("x"),
    element_at(col("embedding"), 2).cast("double").as("y"))

  private final class UF(ids: Iterable[Long]) {
    private val p = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { if (p(x) != x) p(x) = find(p(x)); p(x) }
    def union(a: Long, b: Long): Boolean = {
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false else { p(math.max(ra, rb)) = math.min(ra, rb); true }
    }
  }

  test("q364 = sequential Kruskal + recursive DFS on collected data") {
    // the same mutual-reachability candidate set the gate's substrate
    // builds (minPts = 5, the HDBSCAN family constant)
    val mre = Components.mutualReachEdges(pts2d, eps = 0.05, eps2 = 0.0025,
        minPts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nodes = mre.flatMap(e => Seq(e._1, e._2)).distinct
    // Kruskal over the strict (w, a, b) total order — the tie-broken
    // MST is unique, so Borůvka must elect the identical tree
    val uf = new UF(nodes)
    val mst = mre.sortBy(e => (e._3, e._1, e._2))
      .filter(e => uf.union(e._1, e._2))
    val adj: Map[Long, Seq[(Double, Long)]] =
      mst.flatMap(e => Seq((e._1, e._3, e._2), (e._2, e._3, e._1)))
        .groupBy(_._1)
        .map { case (v, es) =>
          v -> es.map(t => (t._2, t._3)).toSeq.sortBy(identity)
        }
    val comp = nodes.map(n => n -> uf.find(n)).toMap
    val expected = scala.collection.mutable.Buffer
      .empty[(Long, Long, Long, Option[Double])]
    def visit(v: Long, root: Long, parent: Long, pw: Double,
        reach: Option[Double], pos: Long): Long = {
      expected += ((v, root, pos, reach))
      var next = pos + 1
      val ring = adj.getOrElse(v, Seq.empty[(Double, Long)])
      val kids = if (reach.isEmpty) ring else {
        val others = ring.filter(_._2 != parent)
        val (after, before) = others.partition(p =>
          p._1 > pw || (p._1 == pw && p._2 > parent))
        after ++ before // cyclic-after-parent, the Euler-tour order
      }
      kids.foreach { case (w, c) =>
        next = visit(c, root, v, w, Some(w), next)
      }
      next
    }
    comp.values.toSeq.distinct.sorted.foreach(r =>
      visit(r, r, -1L, 0.0, None, 0L))
    val got = SparkEntry.queries("q364_optics_order")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toList
    assert(got == expected.sortBy(t => (t._2, t._3)).toList)
  }

  test("q363 = per-cut union-find cophenetic levels + exact BigInt CPCC") {
    val pairs = Components.gridEpsPairs(pts2d, eps = 0.05, eps2 = 0.0025)
      .where(col("ia") < col("ib"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // coph level = first cut whose ≤t connectivity joins the pair —
    // independent union-find per cut over the FULL candidate set (the
    // gate's scaffold walks the MST instead; Kruskal invariant: same
    // partition)
    val finders = cuts.map { t =>
      val uf = new UF(nodes)
      pairs.filter(_._3 <= t).foreach(p => uf.union(p._1, p._2))
      uf
    }
    val lvls = pairs.map { p =>
      val j = finders.indexWhere(uf => uf.find(p._1) == uf.find(p._2))
      assert(j >= 0, s"pair $p never co-clusters within the ladder")
      (math.round(p._3 * 1e9), j)
    }
    val perLevel = lvls.groupBy(_._2).map { case (j, xs) =>
      (cuts(j), xs.length.toLong, xs.map(_._1).sum)
    }.toList.sortBy(_._1)
    val (n, sx, sy, sxy, sxx, syy) = lvls.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))) {
      case ((n0, a, b, c, d2, e), (x0, j)) =>
        val (x, y) = (BigInt(x0), BigInt(math.round(cuts(j) * 1e9)))
        (n0 + 1, a + x, b + y, c + x * y, d2 + x * x, e + y * y)
    }
    val cpcc = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val got = SparkEntry.queries("q363_cophenetic")(spark, dir)
      .collect().map(r =>
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(got.map(t => (t._1, t._2, t._3)) == perLevel)
    got.foreach(t => assert(math.abs(t._4 - cpcc) < 1e-6,
      s"cpcc ${t._4} vs sequential $cpcc"))
  }

  test("q365 = sequential exponentiated-gradient fold over collected " +
      "domain means") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        expr("(1000 * n_chars) div size(split(text, ' '))").as("l"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val means = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).sum.toDouble / xs.length.toDouble / 1000.0
    }.toSeq.sortBy(_._1)
    val kk = means.length.toDouble
    var a = means.map(_ => 1.0 / kk)
    for (_ <- 0 until 5) {
      val mix = a.zip(means).map { case (ai, (_, m)) => ai * m }.sum
      val u = a.zip(means).map { case (ai, (_, m)) =>
        ai * math.exp(0.5 * (m - mix))
      }
      val s = u.sum
      a = u.map(ui => 0.8 * ui / s + 0.2 / kk)
    }
    val got = SparkEntry.queries("q365_doremi_weights")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toList
    assert(got.map(_._1) == means.map(_._1).toList)
    got.zip(means.map(_._2).zip(a)).foreach { case ((s2, m, w), (em, ew)) =>
      assert(math.abs(m - em) < 1e-6, s"$s2 mean $m vs $em")
      assert(math.abs(w - ew) < 1e-6, s"$s2 weight $w vs $ew")
    }
    // the EG step upweights above-mixture-loss domains: weights must
    // order with the means (strictly monotone given distinct means)
    val byMean = got.sortBy(_._2)
    assert(byMean.map(_._3) == byMean.map(_._3).sorted,
      "weights are not monotone in domain mean loss")
  }

  test("q366 = sequential per-document suffix sort on collected tokens") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val expected = docs.flatMap { case (id, toks) =>
      val order = toks.indices.sortBy(i => toks.drop(i).toSeq)(
        math.Ordering.Implicits.seqOrdering[Seq, String])
      order.zipWithIndex.map { case (off, rank0) =>
        (id, off.toLong, rank0 + 1L)
      }
    }.sortBy(t => (t._1, t._2)).toList
    val got = SparkEntry.queries("q366_suffix_array")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got == expected)
  }

  test("q367 = brute-force per-document longest repeated substring") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def lcp(a: Array[String], i: Int, j: Int): Int = {
      var k = 0
      while (i + k < a.length && j + k < a.length && a(i + k) == a(j + k))
        k += 1
      k
    }
    val expected = docs.map { case (id, toks) =>
      // all pairs, not just SA-adjacent — the theorem under test
      val cands = for {
        i <- toks.indices; j <- (i + 1) until toks.length
      } yield (lcp(toks, i, j), i.toLong, j.toLong)
      if (cands.isEmpty) (id, 0L) else (id, cands.map(_._1).max.toLong)
    }.sortBy(_._1).toList
    val byId = docs.toMap
    val got = SparkEntry.queries("q367_longest_repeat")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toList
    // the LENGTH is the theorem under test: max over ALL pairs must
    // equal the gate's max over SA-adjacent pairs
    assert(got.map(t => (t._1, t._2)) == expected)
    // the reported pair must ACHIEVE the length (the specific pair is
    // the SA-adjacent lexicographic min — pinned by the oracle, not
    // re-derived here: a non-adjacent all-pairs min can differ)
    got.foreach { case (id, len, a) =>
      a.foreach { case (i, j) =>
        assert(lcp(byId(id), i.toInt, j.toInt).toLong == len,
          s"doc $id pair $a does not achieve lrs_len $len")
      }
    }
  }

  test("q368 terciles: per-language buckets are balanced, nll-ordered, " +
      "and nll matches a sequential per-lang unigram model") {
    val got = SparkEntry.queries("q368_ccnet_buckets")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    got.groupBy(_._2).foreach { case (lang, rows) =>
      // NTILE: tile sizes differ by at most one, earlier tiles larger
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)))
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang: $sizes")
      assert(sizes.getOrElse(1L, 0) >= sizes.getOrElse(3L, 0))
      // buckets are monotone in (nll, doc_id)
      val sorted = rows.sortBy(t => (t._3, t._1)).map(_._4)
      assert(sorted.toList == sorted.sorted.toList, s"$lang not monotone")
    }
    // sequential model: per-lang token freqs -> per-doc mean NLL @5
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val byLang = docs.groupBy(_._2)
    val expected = byLang.toSeq.flatMap { case (_, ds) =>
      val freq = ds.flatMap(_._3).groupBy(identity).map { case (t, xs) =>
        t -> xs.length.toLong
      }
      val total = ds.map(_._3.length.toLong).sum
      ds.toSeq.map { case (id, _, toks) =>
        val slp = toks.groupBy(identity).map { case (t, xs) =>
          BigDecimal(math.log(freq(t).toDouble / total))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) * xs.length
        }.sum
        (id, math.rint(-(slp.toDouble) / toks.length * 1e5) / 1e5)
      }
    }.toMap
    got.foreach { case (id, _, nll, _) =>
      assert(math.abs(nll - expected(id)) < 2e-5, s"doc $id nll $nll vs ${expected(id)}")
    }
  }

  test("q369 = sequential within-cell argmax over collected vectors") {
    val vecs = Tables.embeddings(spark, dir)
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
      }
    val cents = AnnCentroids.fitted
    def cellOf(v: Array[Double]): Int =
      cents.indices.minBy(i => (cents(i).indices
        .map(j => (v(j) - cents(i)(j)) * (v(j) - cents(i)(j))).sum, i))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val (d, na, nb) = (a.indices.map(j => a(j) * b(j)).sum,
        math.sqrt(a.indices.map(j => a(j) * a(j)).sum),
        math.sqrt(b.indices.map(j => b(j) * b(j)).sum))
      math.rint(d / (na * nb) * 1e6) / 1e6
    }
    val byCell = vecs.groupBy(v => cellOf(v._2))
    val expected = byCell.values.toSeq.flatMap { cell =>
      cell.flatMap { case (id, v, lab) =>
        val others = cell.filter(_._1 != id)
        if (others.isEmpty) None else {
          def top(f: Int => Boolean): Option[(Long, Double)] = {
            val c = others.filter(o => f(o._3))
              .map(o => (cos(v, o._2), o._1))
            if (c.isEmpty) None
            else Some { val m = c.maxBy(t => (t._1, -t._2)); (m._2, m._1) }
          }
          Some((id, top(_ == lab), top(_ != lab)))
        }
      }
    }.sortBy(_._1).toList
    val got = SparkEntry.queries("q369_triplet_mining")(spark, dir)
      .collect().map { r =>
        def opt(i: Int, c: Int) =
          if (r.isNullAt(i)) None else Some((r.getLong(i), r.getDouble(c)))
        (r.getLong(0), opt(1, 2), opt(3, 4))
      }.toList
    assert(got == expected)
  }

  test("q370 modularity identities: totals from exact moments, q_c " +
      "consistency, and the null-model bound") {
    val rows = SparkEntry.queries("q370_modularity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    val lpa = SparkEntry.queries("q112_label_propagation")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // one row per q112 community, node counts agree
    assert(rows.map(_._1).sorted.toList ==
      lpa.map(_._2).distinct.sorted.toList)
    assert(rows.map(r => r._1 -> r._2).toMap ==
      lpa.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    // Σe_in ≤ m and Σd_c = 2m (every edge end is in exactly one
    // community); recompute the total Q from the banked integers
    val m = rows.map(_._4).sum / 2
    assert(rows.map(_._3).sum <= m)
    val q = rows.map(_._3).sum.toDouble / m -
      rows.map(r => BigInt(r._4) * BigInt(r._4)).sum.toDouble /
        ((2.0 * m) * (2.0 * m))
    rows.foreach(r => assert(math.abs(r._6 - q) < 1e-6,
      s"total ${r._6} vs recomputed $q"))
    assert(q > -1.0 && q <= 1.0)
    rows.foreach { r =>
      val qc = r._3.toDouble / m -
        (r._4.toDouble / (2.0 * m)) * (r._4.toDouble / (2.0 * m))
      assert(math.abs(r._5 - qc) < 1e-6)
    }
  }

  test("q371 conductance identities vs q370's banked integers") {
    val mod = SparkEntry.queries("q370_modularity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    val con = SparkEntry.queries("q371_conductance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toList
    // same communities, same node counts, same volumes
    assert(con.map(t => (t._1, t._2, t._4)) ==
      mod.map(t => (t._1, t._2, t._4)))
    val m = mod.map(_._4).sum / 2
    con.zip(mod).foreach { case ((c, _, cut, vol, phi), (_, _, ein, _)) =>
      // vol = 2·internal + cut (each internal edge charges the
      // community twice, each cut edge once)
      assert(vol == 2 * ein + cut, s"community $c: $vol != 2*$ein + $cut")
      val den = math.min(vol, 2 * m - vol)
      if (den > 0)
        assert(math.abs(phi.get - cut.toDouble / den) < 1e-6)
      else assert(phi.isEmpty)
      phi.foreach(p => assert(p >= 0.0 && p <= 1.0))
    }
    // Σ cut over communities = 2 × (cross-community edges) ≤ 2m
    assert(con.map(_._3).sum <= 2 * m)
  }

  test("kTruss k=4 cascades: a triangle fan peels away ring by ring " +
      "while a disjoint K4 survives with support 2") {
    import spark.implicits._
    // fan around hub 1: every rim edge has ONE triangle (gone round 1),
    // inner spokes (1,3)(1,4)(1,5) have TWO (gone only in round 2,
    // after the rim's removal starves them) — requires ≥2 peel rounds
    val fan = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val k4 = for {
      a <- Seq(10L, 11L, 12L, 13L); b <- Seq(10L, 11L, 12L, 13L)
      if a < b
    } yield (a, b)
    val out = Components.kTruss(
        (fan ++ k4).toDF("id_a", "id_b"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(out == k4.sorted.map { case (a, b) => (a, b, 2L) }.toList)
    // q372's corpus cut: 3-truss = edges with >= 1 triangle (one-round
    // peel at k=3) — cross-check against a brute triangle count
    val edges = Dedup.dedupPipeline(Tables.documents(spark, dir))
      .select("id_a", "id_b").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .filter(t => t._1 != t._2).distinct.toSet
    val sup = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val es = edges.toSeq.sorted
    for {
      (a, b) <- es; c <- es.collect { case (`b`, x) => x }
      if edges((a, c))
    } {
      Seq((a, b), (a, c), (b, c)).foreach(e =>
        sup(e) = sup.getOrElse(e, 0L) + 1)
    }
    val expected = sup.toList.collect {
      case ((a, b), s) if s >= 1 => (a, b, s)
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q372_ktruss")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got == expected)
  }
}
