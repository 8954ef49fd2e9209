package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Mp3Codec / JpegCodec: spec-exact assembly vs independent parse. */
class CompressedSpec extends AnyFunSuite {

  test("mp3 encode -> decodeMeta round-trips every (bitrate, samplerate) combo") {
    for (brIdx <- 1 to 14; srIdx <- 0 to 2; n <- Seq(1, 3, 8); pad <- Seq(0, 17)) {
      val b = Mp3Codec.encode(brIdx, srIdx, n, pad)
      val (kbps, sr, frames, ms) = Mp3Codec.decodeMeta(b)
      val wantK = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      val wantS = Array(44100, 48000, 32000)(srIdx)
      assert((kbps, sr, frames) == ((wantK, wantS, n.toLong)), s"br=$brIdx sr=$srIdx")
      assert(ms == n * 1152L * 1000 / wantS)
    }
  }

  test("mp3 frame padding bit contributes exactly one byte per padded frame") {
    // frames 0..5 carry padding 0,1,0,1,0,1 -> total = 6*base + 3
    val b = Mp3Codec.encode(10, 0, 6, 0) // 160 kbps @ 44100
    val base = 144 * 160000 / 44100
    assert(b.length == 10 + 6 * base + 3)
  }

  test("mp3 parser skips the ID3v2 envelope by syncsafe size (incl. >127 bytes)") {
    val b = Mp3Codec.encode(12, 1, 2, 200) // tag body crosses the 7-bit boundary
    assert(Mp3Codec.decodeMeta(b)._3 == 2L)
  }

  test("mp3 parser fails loudly on structural damage") {
    val good = Mp3Codec.encode(10, 0, 3, 5)
    // damaged sync mid-stream
    val bad = good.clone()
    bad(10 + 5 + 144 * 160000 / 44100) = 0x00
    intercept[Exception](Mp3Codec.decodeMeta(bad))
    // truncated final frame
    intercept[Exception](Mp3Codec.decodeMeta(good.dropRight(7)))
    // junk payload
    intercept[Exception](Mp3Codec.decodeMeta(Array.fill[Byte](64)(0x41)))
  }

  test("jpeg encode -> own SOF walk agrees with the encode params (rgb + gray)") {
    for ((w, h, gray) <- Seq((64, 48, false), (8, 8, true), (120, 16, false))) {
      val b = JpegCodec.encode(w, h, gray, seed = 7)
      val (pw, ph, nc, prec) = JpegCodec.decodeMeta(b)
      assert((pw, ph) == ((w, h)))
      assert(nc == (if (gray) 1 else 3))
      assert(prec == 8)
    }
  }

  test("jpeg own walk agrees with ImageIO's reader on dimensions") {
    val b = JpegCodec.encode(88, 40, gray = false, seed = 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val (pw, ph, _, _) = JpegCodec.decodeMeta(b)
    assert((img.getWidth, img.getHeight) == ((pw, ph)))
  }

  test("mp4 encode -> own box walk round-trips every field") {
    for (ts <- Seq(600, 90000); dur <- Seq(1000, 12345); nt <- 1 to 3) {
      val b = Mp4Codec.encode(ts, dur, nt, 320, 240, 77)
      val (brand, pts, pdur, pnt, w, h) = Mp4Codec.decodeMeta(b)
      assert((brand, pts, pdur, pnt, w, h) == (("isom", ts, dur.toLong, nt, 320, 240)))
    }
  }

  test("mp4 walk validates box bounds — truncation and bad sizes fail loudly") {
    val good = Mp4Codec.encode(1000, 500, 2, 64, 48, 30)
    intercept[Exception](Mp4Codec.decodeMeta(good.take(40)))    // cut inside moov
    intercept[Exception](Mp4Codec.decodeMeta(good.dropRight(5))) // cut inside mdat
    val bad = good.clone()
    bad(0) = 0x7f.toByte // ftyp size becomes enormous
    intercept[Exception](Mp4Codec.decodeMeta(bad))
    intercept[Exception](Mp4Codec.decodeMeta(Array.fill[Byte](16)(3)))
  }

  test("adpcm round-trip reconstructs a tone within quantization noise") {
    val pcm = WavCodec.decodeSamples(WavCodec.encodeTone(2000, 1000.0, 8000))
    val adpcm = AdpcmCodec.encode(pcm)
    assert(adpcm.length == 4 + 2000 / 2) // exact 4:1 layout + header
    val back = AdpcmCodec.decode(adpcm, 2000)
    assert(back.length == pcm.length)
    // closed-loop encode keeps tracking error bounded by the step size
    val maxErr = pcm.zip(back).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 2048, s"ADPCM tracking error $maxErr too large")
    // and the reconstructed signal still carries the planted tone:
    // on-bin power dominates every off-bin probe by a wide margin
    val on = WavCodec.goertzel(back, 1000.0, 8000)
    for (f <- Seq(500.0, 2000.0, 3000.0))
      assert(on > 50 * WavCodec.goertzel(back, f, 8000), s"off-probe $f")
  }

  test("adpcm handles step extremes: silence, full-swing square, odd lengths") {
    for (src <- Seq(
      Array.fill[Short](101)(0),
      Array.tabulate[Short](64)(i => if (i % 2 == 0) 32767 else -32768),
      Array.tabulate[Short](7)(i => (i * 1000).toShort))) {
      val back = AdpcmCodec.decode(AdpcmCodec.encode(src), src.length)
      assert(back.length == src.length)
      assert(back(0) == src(0)) // predictor seeds exactly
    }
    intercept[Exception](AdpcmCodec.decode(Array[Byte](1, 2), 10))
  }

  test("avi encode -> own walk + real JPEG frame decode round-trips") {
    for ((w, h, nf, us) <- Seq((64, 48, 3, 33333), (16, 16, 1, 66667))) {
      val b = AviCodec.encode(w, h, nf, us)
      val (pw, ph, decl, pus, dec) = AviCodec.decode(b)
      assert((pw, ph, decl, pus, dec) == ((w, h, nf, us, nf)))
    }
  }

  test("avi walk rejects truncation and dimension lies") {
    val good = AviCodec.encode(32, 32, 2, 40000)
    intercept[Exception](AviCodec.decode(good.take(60)))
    intercept[Exception](AviCodec.decode(good.dropRight(9)))
    intercept[Exception](AviCodec.decode("RIFFxxxxJUNK".getBytes))
    // header claims different dims than the frames carry
    val lied = AviCodec.encode(32, 32, 1, 40000)
    // find avih width field (offset of "avih" + 8 + 32) and corrupt it
    val idx = lied.indexOfSlice("avih".getBytes)
    lied(idx + 8 + 32) = 64
    intercept[Exception](AviCodec.decode(lied))
  }

  test("jpeg parser rejects damaged payloads") {
    val good = JpegCodec.encode(32, 32, gray = false)
    intercept[Exception](JpegCodec.decodeMeta(good.take(10)))   // truncated
    intercept[Exception](JpegCodec.decodeMeta(good.dropRight(2))) // no EOI
    intercept[Exception](JpegCodec.decodeMeta("not a jpeg".getBytes))
  }
}
