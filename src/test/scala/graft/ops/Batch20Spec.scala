package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-checks for q313–q315 at sf0.001. */
class Batch20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q313 PPR conserves unit mass and floors every seed at the teleport share") {
    val rows = SparkEntry.queries("q313_personalized_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ns = Tables.documents(spark, sf)
      .where(col("doc_id") % 100 === 0).count().toDouble
    // positive-score rows must include every seed, each at >= 0.15/ns
    val seedScores = rows.filter(_._1 % 100 == 0)
    assert(seedScores.length.toLong == ns.toLong)
    for ((id, sc) <- seedScores)
      assert(sc >= 0.15 / ns - 1e-6, s"seed $id below teleport floor: $sc")
    // total mass is 1 up to the round@6 truncation of suppressed zeros
    val mass = rows.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"PPR mass $mass")
  }

  test("q314 recall audit matches a driver-side double ranking exactly") {
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top5(qid: Long, d: Int): Set[Long] = {
      val q = embs.find(_._1 == qid).get._2
      embs.filter(_._1 != qid)
        .map { case (id, v) => (cos(q, v, d), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
    }
    val got = SparkEntry.queries("q314_matryoshka_recall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (qid <- 0L until 5L) {
      val want = (top5(qid, 64) & top5(qid, 16)).size.toLong
      assert(got(qid) == want, s"q$qid overlap ${got(qid)} vs $want")
    }
  }

  test("q315 OHLC bars match a driver-side walk exactly") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val want = ev.groupBy(_._1 / 3600000000L).toSeq.map { case (hr, es) =>
      val sorted = es.sortBy(e => (e._1, e._2))
      (hr, es.length.toLong, sorted.head._3 / 100.0,
        es.map(_._3).max / 100.0, es.map(_._3).min / 100.0,
        sorted.last._3 / 100.0)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q315_ohlc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.length == want.length)
    for ((w, g) <- want.zip(got)) {
      assert(g._1 == w._1 && g._2 == w._2)
      assert(math.abs(g._3 - w._3) < 0.005 && math.abs(g._4 - w._4) < 0.005)
      assert(math.abs(g._5 - w._5) < 0.005 && math.abs(g._6 - w._6) < 0.005)
      assert(g._5 <= g._3 && g._3 <= g._4, "low <= open <= high")
      assert(g._5 <= g._6 && g._6 <= g._4, "low <= close <= high")
    }
  }
}
