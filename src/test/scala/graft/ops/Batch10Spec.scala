package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import graft.multimodal.WavCodec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for q293/q294 at sf0.001, plus unit-level
  * DSP checks for the Goertzel detector (margin, rejection, corrupt
  * input) that the planted-tone gate alone can't show.
  */
class Batch10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q293 keywords match a driver-side TF-IDF reference exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(tok => (id, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = docs.length.toDouble
    def r(x: Double, s: Int) = BigDecimal.valueOf(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf.toSeq.map { case ((id, tok), c) =>
      (id, tok, r(c * r(math.log(n / dfreq(tok)), 9), 6))
    }.groupBy(_._1).toSeq.flatMap { case (id, es) =>
      es.sortBy(e => (-e._3, e._2)).take(3).zipWithIndex
        .map { case ((_, tok, sc), i) => (id, (i + 1).toLong, tok, sc) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q293_keyword_extract")(spark, sf)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getString(2),
        r0.getDouble(3))).toSeq
    assert(got == want)
  }

  test("q294 detects the planted band for every document") {
    val rows = SparkEntry.queries("q294_audio_fingerprint")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 4).toInt)
      assert(r.getLong(3) == 1600 + id % 800)
    }
  }

  test("Goertzel: planted bin dominates leakage by orders of magnitude") {
    val probes = Array(500.0, 1000.0, 2000.0, 3000.0)
    for (band <- probes.indices; n <- Seq(1600, 2399)) {
      val xs = WavCodec.decodeSamples(WavCodec.encodeTone(n, probes(band)))
      val p = probes.map(f => WavCodec.goertzel(xs, f, 8000))
      assert(p.indices.maxBy(i => p(i)) == band)
      val others = p.indices.filter(_ != band).map(p).max
      assert(p(band) > 100 * others,
        s"band $band n $n: planted ${p(band)} vs max leak $others")
    }
  }

  test("Goertzel rejects an off-bank tone (no probe wins big)") {
    // a 1500 Hz tone sits between the 1000/2000 probes: whatever probe
    // wins must do so with FAR less power than a planted on-probe tone
    val xs = WavCodec.decodeSamples(WavCodec.encodeTone(1600, 1500.0))
    val off = Array(500.0, 1000.0, 2000.0, 3000.0)
      .map(f => WavCodec.goertzel(xs, f, 8000)).max
    val on = WavCodec.goertzel(
      WavCodec.decodeSamples(WavCodec.encodeTone(1600, 1000.0)), 1000.0, 8000)
    assert(on > 100 * off)
  }

  test("decodeSamples fails loudly on corrupt payloads") {
    val good = WavCodec.encodeTone(1600, 1000.0)
    intercept[Exception] { WavCodec.decodeSamples(good.take(10)) }
    intercept[Exception] { WavCodec.decodeSamples(good.take(100)) } // truncated data
    val shifted = good.clone(); shifted(8) = 'X'.toByte // break WAVE magic
    intercept[Exception] { WavCodec.decodeSamples(shifted) }
  }

  test("writePcm16 bytes are genuine WAV: byte-identical to the JDK writer, JDK-readable") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val payload = WavCodec.encodeTone(777, 1000.0)
    // JDK writer emits the exact same container bytes for this format
    val raw = {
      val xs = WavCodec.decodeSamples(payload)
      val data = new Array[Byte](xs.length * 2)
      for (i <- xs.indices) {
        data(2 * i) = (xs(i) & 0xff).toByte
        data(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
      }
      data
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(raw), fmt, raw.length / 2)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    assert(java.util.Arrays.equals(out.toByteArray, payload),
      "own RIFF writer must emit the JDK writer's exact bytes")
    // and the JDK READER decodes our container to the same samples
    val jdkIn = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val jdkBytes = try jdkIn.readAllBytes() finally jdkIn.close()
    val jdkSamples = Array.tabulate(jdkBytes.length / 2)(i =>
      ((jdkBytes(2 * i) & 0xff) | (jdkBytes(2 * i + 1) << 8)).toShort)
    assert(jdkSamples.sameElements(WavCodec.decodeSamples(payload)))
  }
}
