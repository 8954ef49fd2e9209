package graft.multimodal

import org.apache.spark.sql.functions._

/** Compressed-media metadata codecs — shrinking the one knowingly
  * stubbed area (compressed audio/video) with what the JDK really
  * provides, the q135/q194 discipline: fixtures are genuinely ENCODED
  * (ImageIO's real JPEG writer; our own spec-exact MPEG frame
  * assembler), then genuinely PARSED back by independent code (our own
  * marker/header walks, not the writer's library), and the oracle
  * re-derives every field arithmetically from the id-determined encode
  * params — so any slip anywhere in the write → parse round trip flips
  * rows. Corrupt payloads are planted and must quarantine per record,
  * never fail the job (the 100 TB posture: a bad blob is a row, not an
  * exception).
  *
  * The flod ecosystem's analog is flod-mad (MPEG audio decode,
  * `/root/reference/README.md:58-60`); full audio DECODE still needs
  * codecs this container doesn't ship, but the metadata walk — the
  * part a corpus-triage pass actually runs — is real here.
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1–14. */
  private val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample rates by header index 0–2. */
  private val SampleRates = Array(44100, 48000, 32000)
  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  /** Layer III MPEG-1 frame length: 144·bitrate/samplerate + padding. */
  private def frameLen(brIdx: Int, srIdx: Int, pad: Int): Int =
    144 * (Bitrates(brIdx) * 1000) / SampleRates(srIdx) + pad

  /** Assemble a spec-exact MP3: ID3v2.3 tag (syncsafe size, `tagPad`
    * bytes of body) + `nFrames` MPEG-1 Layer III mono frames, frame i
    * carrying padding bit i%2. Body bytes are deterministic junk — the
    * parser must advance by COMPUTED frame length, never by scanning. */
  def encode(brIdx: Int, srIdx: Int, nFrames: Int, tagPad: Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0) // v2.3.0, no flags
    // syncsafe 28-bit size (7 bits per byte, high bit clear)
    out.write((tagPad >> 21) & 0x7f); out.write((tagPad >> 14) & 0x7f)
    out.write((tagPad >> 7) & 0x7f); out.write(tagPad & 0x7f)
    var j = 0
    while (j < tagPad) { out.write(j * 13 & 0x7f); j += 1 }
    var i = 0
    while (i < nFrames) {
      val pad = i % 2
      val len = frameLen(brIdx, srIdx, pad)
      out.write(0xff)
      out.write(0xfb) // sync|MPEG1|LayerIII|no-CRC
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(0xc0) // mono
      var k = 4
      while (k < len) { out.write((i * 7 + k) & 0xff); k += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** Real MPEG frame-header walk: skip the ID3v2 envelope via its
    * syncsafe size, then validate EVERY frame header (sync, version,
    * layer, bitrate/samplerate indexes), advance by computed frame
    * length, and require the walk to land exactly on end-of-payload.
    * Fails loudly on any structural damage — the quarantine trigger.
    * Returns (bitrateKbps, sampleRate, nFrames, durationMs). */
  def decodeMeta(b: Array[Byte]): (Int, Int, Long, Long) = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + size
    }
    var kbps = -1
    var sr = -1
    var n = 0L
    while (off < b.length) {
      require(off + 4 <= b.length, "truncated frame header")
      require((b(off) & 0xff) == 0xff && (b(off + 1) & 0xe0) == 0xe0,
        s"bad frame sync at $off")
      require(((b(off + 1) >> 3) & 3) == 3, "not MPEG-1")
      require(((b(off + 1) >> 1) & 3) == 1, "not Layer III")
      val brIdx = (b(off + 2) >> 4) & 0xf
      val srIdx = (b(off + 2) >> 2) & 3
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrate index $brIdx")
      require(srIdx <= 2, s"bad samplerate index $srIdx")
      val fk = Bitrates(brIdx)
      val fs = SampleRates(srIdx)
      require(kbps < 0 || (kbps == fk && sr == fs), "inconsistent stream params")
      kbps = fk; sr = fs
      val len = frameLen(brIdx, srIdx, (b(off + 2) >> 1) & 1)
      require(off + len <= b.length, "truncated frame body")
      off += len
      n += 1
    }
    require(n > 0, "no MPEG frames")
    (kbps, sr, n, n * SamplesPerFrame * 1000L / sr)
  }
}

/** Real JPEG metadata walk — ImageIO's genuine JPEG WRITER makes the
  * fixtures; our own SOI→SOF→EOI segment walk (not ImageIO) reads them
  * back, so writer and parser cannot share a bug. */
object JpegCodec {
  import java.awt.image.BufferedImage
  import java.io.ByteArrayOutputStream
  import javax.imageio.ImageIO

  // In-memory ImageIO stream caching, owned by core.ImageIoDefaults
  // (ADVICE r18: one eagerly-initialized site instead of six object
  // initializers). Measured on q326: the temp-file default read
  // monotonically climbing iterations, 16 s → 31 s.
  graft.core.ImageIoDefaults.ensure()

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** Deterministic genuine JPEG: RGB (3-component) or grayscale
    * (1-component), pixels a pure function of (x, y, seed), written by
    * the JDK's real JPEG encoder. */
  def encode(width: Int, height: Int, gray: Boolean, seed: Int = 0): Array[Byte] = {
    val img = new BufferedImage(width, height,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xffffff)
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", out), "no ImageIO JPEG writer in this JVM")
    out.toByteArray
  }

  /** Own SOF-marker walk: validates SOI, steps marker segments by their
    * declared lengths (skipping entropy-coded scan data by FF-byte
    * scan, honoring FF00 stuffing and RST markers), reads dimensions /
    * precision / component count from the first SOFn, and requires a
    * terminating EOI. Returns (width, height, nComponents, precision). */
  def decodeMeta(b: Array[Byte]): (Int, Int, Int, Int) = {
    require(isJpeg(b), "no SOI marker")
    def u8(o: Int) = b(o) & 0xff
    def u16(o: Int) = (u8(o) << 8) | u8(o + 1)
    var off = 2
    var sof: (Int, Int, Int, Int) = null
    while (true) {
      require(off + 2 <= b.length, "truncated before marker")
      require(u8(off) == 0xff, s"expected marker at $off")
      val m = u8(off + 1)
      if (m == 0xd9) { // EOI
        require(sof != null, "no SOF before EOI")
        return sof
      }
      require(m != 0xd8 && (m == 0x01 || m >= 0xc0),
        s"stray byte in marker stream at $off")
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2 // standalone
      else {
        val len = u16(off + 2)
        require(len >= 2 && off + 2 + len <= b.length, "truncated segment")
        if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          require(sof == null, "multiple SOF segments")
          sof = (u16(off + 7), u16(off + 5), u8(off + 9), u8(off + 4))
        }
        off += 2 + len
        if (m == 0xda) { // SOS: skip entropy-coded data to next true marker
          var scan = off
          var done = false
          while (!done) {
            require(scan + 1 < b.length, "truncated scan data")
            if (u8(scan) == 0xff && u8(scan + 1) != 0x00 &&
              !(u8(scan + 1) >= 0xd0 && u8(scan + 1) <= 0xd7)) done = true
            else scan += 1
          }
          off = scan
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Real ISO-BMFF (MP4) box walk — the video-CONTAINER leg: no codec
  * ships for the sample data itself (mdat stays opaque junk, exactly
  * as a metadata triage pass treats it), but the box structure — the
  * part that answers "how long / how big / how many tracks" without
  * decoding a frame — is assembled spec-exactly and parsed back by an
  * independent walk. */
object Mp4Codec {
  import java.io.ByteArrayOutputStream

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + payload.length)
    u32(out, 8L + payload.length)
    out.write(typ.getBytes("US-ASCII"), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Minimal spec-exact MP4: ftyp + moov(mvhd, n×trak(tkhd)) + mdat.
    * mvhd version 0 carries timescale/duration; each tkhd carries
    * 16.16 fixed-point width/height. */
  def encode(timescale: Int, durationTicks: Int, nTraks: Int,
             width: Int, height: Int, mdatLen: Int): Array[Byte] = {
    val mvhd = new ByteArrayOutputStream()
    u32(mvhd, 0) // version 0 + flags
    u32(mvhd, 0); u32(mvhd, 0) // creation, modification
    u32(mvhd, timescale.toLong); u32(mvhd, durationTicks.toLong)
    u32(mvhd, 0x00010000L) // rate 1.0
    mvhd.write(0x01); mvhd.write(0x00) // volume 1.0
    mvhd.write(new Array[Byte](10)) // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(u32(mvhd, _)) // unity matrix
    mvhd.write(new Array[Byte](24)) // pre_defined
    u32(mvhd, nTraks + 1L) // next_track_ID
    val traks = (1 to nTraks).map { tid =>
      val t = new ByteArrayOutputStream()
      u32(t, 0); u32(t, 0); u32(t, 0) // ver/flags, creation, modification
      u32(t, tid.toLong); u32(t, 0) // track_ID, reserved
      u32(t, durationTicks.toLong)
      t.write(new Array[Byte](8)) // reserved
      t.write(new Array[Byte](8)) // layer, alternate_group, volume, reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(u32(t, _))
      u32(t, width.toLong << 16); u32(t, height.toLong << 16) // 16.16
      box("trak", box("tkhd", t.toByteArray))
    }
    val out = new ByteArrayOutputStream()
    val ftyp = new ByteArrayOutputStream()
    ftyp.write("isom".getBytes, 0, 4); u32(ftyp, 0)
    ftyp.write("isom".getBytes, 0, 4); ftyp.write("mp41".getBytes, 0, 4)
    out.write(box("ftyp", ftyp.toByteArray))
    val moov = new ByteArrayOutputStream()
    moov.write(box("mvhd", mvhd.toByteArray))
    traks.foreach(t => moov.write(t))
    out.write(box("moov", moov.toByteArray))
    out.write(box("mdat", Array.tabulate[Byte](mdatLen)(i => (i * 31 & 0xff).toByte)))
    out.toByteArray
  }

  /** Own validating box walk: every top-level box's declared size must
    * land in bounds and the walk must consume the payload exactly;
    * moov recurses for mvhd (timescale/duration) and trak/tkhd
    * (dimensions). Returns (brand, timescale, durationTicks, nTraks,
    * width, height). */
  def decodeMeta(b: Array[Byte]): (String, Int, Long, Int, Int, Int) = {
    def ru32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    var brand: String = null
    var timescale = -1
    var duration = -1L
    var nTraks = 0
    var w = -1
    var h = -1
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var off = from
      while (off < to) {
        require(off + 8 <= to, s"truncated box header at $off")
        val size = ru32(off)
        require(size >= 8 && off + size <= to, s"box size $size out of bounds at $off")
        val typ = fourcc(off + 4)
        typ match {
          case "ftyp" => brand = fourcc(off + 8)
          case "moov" => walk(off + 8, off + size.toInt, depth + 1)
          case "trak" => nTraks += 1; walk(off + 8, off + size.toInt, depth + 1)
          case "mvhd" =>
            require(b(off + 8) == 0, "only mvhd version 0 supported")
            timescale = ru32(off + 20).toInt
            duration = ru32(off + 24)
          case "tkhd" if w < 0 =>
            require(b(off + 8) == 0, "only tkhd version 0 supported")
            w = (ru32(off + 8 + 76) >> 16).toInt
            h = (ru32(off + 8 + 80) >> 16).toInt
          case _ => // skip (mdat, free, ...)
        }
        off += size.toInt
      }
      require(off == to, "box walk overran payload")
    }
    walk(0, b.length, 0)
    require(brand != null, "no ftyp box")
    require(timescale > 0, "no mvhd box")
    (brand, timescale, duration, nTraks, w, h)
  }
}

/** REAL compressed-audio DECODE — IMA ADPCM (DVI/IMA, public spec):
  * 4-bit adaptive differential PCM, the classic 4:1 telephony/game
  * codec. Unlike the MP3 walk (metadata-only — no MPEG decoder ships
  * here), ADPCM is fully implementable from the spec tables, so this
  * is an actual sample-reconstructing decoder: encode quantizes each
  * delta to 4 bits against an adaptive step, decode mirrors it, and
  * the q294 Goertzel detector must still recover the planted tone
  * from the RECONSTRUCTED samples — an end-to-end proof the codec
  * math is right (a wrong step-table index or clamp produces
  * broadband garbage, not a detectable tone). */
object AdpcmCodec {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Stream layout: predictor s16-LE (= sample 0), step index u8,
    * reserved 0, then one 4-bit code per remaining sample, two codes
    * per byte, low nibble first. Size = 4 + ceil((n-1)/2). */
  def encode(samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "empty sample stream")
    val nNib = samples.length - 1
    val out = new Array[Byte](4 + (nNib + 1) / 2)
    var pred = samples(0).toInt
    // seed the step index from the first delta (stored in the header,
    // like WAV ADPCM block headers do) — starting at index 0 forces a
    // slope-overload attack transient dozens of samples long on any
    // full-scale signal
    var index = {
      val d0 = if (samples.length > 1) math.abs(samples(1) - pred) else 0
      var ix = 0
      while (ix < 88 && StepTable(ix) < d0) ix += 1
      ix
    }
    out(0) = (pred & 0xff).toByte
    out(1) = ((pred >> 8) & 0xff).toByte
    out(2) = index.toByte
    out(3) = 0
    var i = 0
    while (i < nNib) {
      val step = StepTable(index)
      var diff = samples(i + 1) - pred
      var nib = 0
      if (diff < 0) { nib = 8; diff = -diff }
      if (diff >= step) { nib |= 4; diff -= step }
      if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) { nib |= 1 }
      // reconstruct exactly as the decoder will, so the predictor
      // tracks the DECODED signal (standard ADPCM closed-loop encode)
      var delta = step >> 3
      if ((nib & 4) != 0) delta += step
      if ((nib & 2) != 0) delta += step >> 1
      if ((nib & 1) != 0) delta += step >> 2
      pred = if ((nib & 8) != 0) pred - delta else pred + delta
      pred = math.max(-32768, math.min(32767, pred))
      index = math.max(0, math.min(88, index + IndexTable(nib & 7)))
      val pos = 4 + i / 2
      if (i % 2 == 0) out(pos) = (nib & 0x0f).toByte
      else out(pos) = (out(pos) | (nib << 4)).toByte
      i += 1
    }
    out
  }

  /** Real sample reconstruction. `n` = expected sample count (the
    * nibble stream's final half-byte is padding when n-1 is odd). */
  def decode(b: Array[Byte], n: Int): Array[Short] = {
    require(b.length >= 4, "truncated ADPCM header")
    require(b.length == 4 + n / 2, s"size mismatch: ${b.length} for $n samples")
    val out = new Array[Short](n)
    var pred = ((b(0) & 0xff) | (b(1) << 8)).toShort.toInt
    var index = b(2) & 0xff
    require(index <= 88, s"bad initial step index $index")
    out(0) = pred.toShort
    var i = 0
    while (i < n - 1) {
      val byte = b(4 + i / 2) & 0xff
      val nib = if (i % 2 == 0) byte & 0x0f else byte >> 4
      val step = StepTable(index)
      var delta = step >> 3
      if ((nib & 4) != 0) delta += step
      if ((nib & 2) != 0) delta += step >> 1
      if ((nib & 1) != 0) delta += step >> 2
      pred = if ((nib & 8) != 0) pred - delta else pred + delta
      pred = math.max(-32768, math.min(32767, pred))
      index = math.max(0, math.min(88, index + IndexTable(nib & 7)))
      out(i + 1) = pred.toShort
      i += 1
    }
    out
  }
}

/** REAL video DECODE — MJPEG in an AVI (RIFF) container: the container
  * walk is our own (RIFF/LIST/avih/movi/00dc chunk parse, public
  * spec), and every frame is a genuine JPEG decoded by the JDK's real
  * decoder — actual pixel-producing video decode, not a stub and not
  * metadata-only. Formats whose codecs truly don't ship (H.264, VP9)
  * remain out of scope; MJPEG is the honest JDK-only video codec. */
object AviCodec {
  import java.io.ByteArrayOutputStream

  graft.core.ImageIoDefaults.ensure() // in-memory stream caching

  private def w32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + payload.length + 1)
    out.write(fourcc.getBytes("US-ASCII"), 0, 4)
    w32(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
    if (payload.length % 2 == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }
  private def list(listType: String, children: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(listType.getBytes("US-ASCII"), 0, 4)
    out.write(children, 0, children.length)
    chunk("LIST", out.toByteArray)
  }

  /** Minimal spec-exact MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih,
    * LIST(strl){strh,strf}}, LIST(movi){00dc×n} }. Frames are real
    * JPEGs ([[JpegCodec.encode]]), pixels a function of (x,y,frame). */
  def encode(width: Int, height: Int, nFrames: Int, usPerFrame: Int,
             seed: Int = 0): Array[Byte] = {
    val avih = new ByteArrayOutputStream()
    w32(avih, usPerFrame.toLong); w32(avih, 0); w32(avih, 0); w32(avih, 0)
    w32(avih, nFrames.toLong); w32(avih, 0); w32(avih, 1); w32(avih, 0)
    w32(avih, width.toLong); w32(avih, height.toLong)
    (0 until 4).foreach(_ => w32(avih, 0)) // reserved
    val strh = new ByteArrayOutputStream()
    strh.write("vids".getBytes, 0, 4); strh.write("MJPG".getBytes, 0, 4)
    (0 until 12).foreach(_ => w32(strh, 0))
    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    w32(strf, 40); w32(strf, width.toLong); w32(strf, height.toLong)
    w32(strf, (24L << 16) | 1) // planes=1, bitcount=24
    strf.write("MJPG".getBytes, 0, 4)
    (0 until 5).foreach(_ => w32(strf, 0))
    val frames = new ByteArrayOutputStream()
    (0 until nFrames).foreach { f =>
      val jpeg = JpegCodec.encode(width, height, gray = false, seed = seed + f * 131)
      frames.write(chunk("00dc", jpeg))
    }
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes, 0, 4)
    body.write(list("hdrl",
      chunk("avih", avih.toByteArray) ++
        list("strl", chunk("strh", strh.toByteArray) ++
          chunk("strf", strf.toByteArray))))
    body.write(list("movi", frames.toByteArray))
    chunk("RIFF", body.toByteArray)
  }

  /** Own RIFF walk + REAL per-frame JPEG decode. Returns (width,
    * height, nFramesDeclared, usPerFrame, nFramesDecoded) where
    * nFramesDecoded counts movi 00dc payloads that ImageIO actually
    * decoded at the declared dimensions — a corrupted frame or a
    * dimension lie fails the walk. */
  def decode(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
    def ru32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      "not a RIFF/AVI payload")
    require(8 + ru32(4) <= b.length, "truncated RIFF payload")
    var w = -1; var h = -1; var nDecl = -1; var usPf = -1; var nDec = 0
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(off)
        val sz = ru32(off + 4).toInt
        require(off + 8 + sz <= to, s"chunk $id overruns enclosure at $off")
        if (id == "LIST") walk(off + 12, off + 8 + sz)
        else if (id == "avih") {
          usPf = ru32(off + 8).toInt
          nDecl = ru32(off + 24).toInt
          w = ru32(off + 40).toInt
          h = ru32(off + 44).toInt
        } else if (id == "00dc") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, off + 8, sz))
          require(img != null, s"frame at $off is not decodable")
          require(img.getWidth == w && img.getHeight == h,
            s"frame dims ${img.getWidth}x${img.getHeight} != header ${w}x$h")
          nDec += 1
        }
        off += 8 + sz + (sz & 1)
      }
    }
    walk(12, (8 + ru32(4)).toInt)
    require(nDecl >= 0, "no avih header")
    (w, h, nDecl, usPf, nDec)
  }
}

object Compressed {

  def defs: Seq[graft.QueryDef] = Seq(

    // Real MPEG audio metadata gate: spec-exact MP3 assembly (ID3v2
    // envelope + MPEG-1 Layer III frames, params pure functions of the
    // id) → independent frame-header walk. Every %41 doc is damaged at
    // its SECOND frame's sync byte, so the parser must fail mid-walk
    // and the row must quarantine — per record, job-green. Heavy
    // per-doc work ⇒ ids repartition BEFORE encode (the q294 lesson);
    // payloads never shuffle.
    graft.QueryDef("q321_mp3_meta",
      (s, d) => {
        import s.implicits._
        graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions(_.map { id =>
            val brIdx = 10 + (id % 4).toInt // 160/192/224/256 kbps
            val srIdx = (id % 3).toInt
            val nFrames = 3 + (id % 9).toInt
            val bytes = Mp3Codec.encode(brIdx, srIdx, nFrames, (id % 50).toInt)
            if (id % 41 == 0) {
              // damage frame 2's sync: first frame parses, walk then dies
              var off = 10 + (id % 50).toInt
              off += 144 * ((Array(160, 192, 224, 256)(brIdx - 10)) * 1000) /
                Array(44100, 48000, 32000)(srIdx) // frame 0, pad 0
              bytes(off) = 0x00
            }
            try {
              val (kbps, sr, n, ms) = Mp3Codec.decodeMeta(bytes)
              (id, "audio/mpeg", kbps, sr, n, ms, bytes.length.toLong)
            } catch { case _: Exception =>
              (id, "corrupt", 0, 0, 0L, 0L, bytes.length.toLong)
            }
          })
          .toDF("doc_id", "format", "bitrate_kbps", "sample_rate",
            "n_frames", "duration_ms", "bytes")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    CASE doc_id % 4 WHEN 0 THEN 160 WHEN 1 THEN 192
             |         WHEN 2 THEN 224 ELSE 256 END AS kbps,
             |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
             |         ELSE 32000 END AS sr,
             |    3 + doc_id % 9 AS n, doc_id % 50 AS tagpad
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, kbps, sr, n,
             |    10 + tagpad + n * (144 * kbps * 1000 // sr) + n // 2 AS bytes
             |  FROM p)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 41 = 0 THEN 'corrupt'
             |       ELSE 'audio/mpeg' END AS format,
             |  CAST(CASE WHEN doc_id % 41 = 0 THEN 0 ELSE kbps END AS INT)
             |    AS bitrate_kbps,
             |  CAST(CASE WHEN doc_id % 41 = 0 THEN 0 ELSE sr END AS INT)
             |    AS sample_rate,
             |  CAST(CASE WHEN doc_id % 41 = 0 THEN 0 ELSE n END AS BIGINT)
             |    AS n_frames,
             |  CAST(CASE WHEN doc_id % 41 = 0 THEN 0
             |       ELSE n * 1152 * 1000 // sr END AS BIGINT) AS duration_ms,
             |  CAST(bytes AS BIGINT) AS bytes
             |FROM q ORDER BY doc_id""".stripMargin)),

    // Real JPEG metadata gate: the JDK's genuine JPEG encoder writes
    // RGB or grayscale fixtures; our own SOI→SOF→EOI marker walk (with
    // entropy-data skipping and FF-stuffing) reads dimensions,
    // component count, and precision back. Every %37 doc truncates to
    // its first 10 bytes → per-record quarantine. Encoded size is
    // entropy-coded (not arithmetic), so bytes is deliberately NOT an
    // output — every emitted field is oracle-derivable.
    graft.QueryDef("q322_jpeg_meta",
      (s, d) => {
        import s.implicits._
        graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions(_.map { id =>
            val w = 8 * (1 + (id % 16).toInt)
            val h = 8 * (1 + ((id / 2) % 12).toInt)
            val full = JpegCodec.encode(w, h, gray = id % 5 == 0, seed = id.toInt)
            val payload = if (id % 37 == 0) full.take(10) else full
            try {
              val (pw, ph, nc, prec) = JpegCodec.decodeMeta(payload)
              (id, "image/jpeg", pw, ph, nc, prec)
            } catch { case _: Exception => (id, "corrupt", 0, 0, 0, 0) }
          })
          .toDF("doc_id", "format", "width", "height", "n_comp", "precision_")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 37 = 0 THEN 'corrupt'
             |       ELSE 'image/jpeg' END AS format,
             |  CAST(CASE WHEN doc_id % 37 = 0 THEN 0
             |       ELSE 8 * (1 + doc_id % 16) END AS INT) AS width,
             |  CAST(CASE WHEN doc_id % 37 = 0 THEN 0
             |       ELSE 8 * (1 + (doc_id // 2) % 12) END AS INT) AS height,
             |  CAST(CASE WHEN doc_id % 37 = 0 THEN 0
             |       WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS INT) AS n_comp,
             |  CAST(CASE WHEN doc_id % 37 = 0 THEN 0 ELSE 8 END AS INT)
             |    AS precision_
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Real MP4 container metadata gate: spec-exact ISO-BMFF assembly
    // (ftyp/moov/mvhd/trak/tkhd/mdat, params pure functions of the id)
    // → independent validating box walk. Every %43 doc is truncated
    // INSIDE its moov box, so the size-bounds check must fire and the
    // row quarantine per record. The duration surfaces in ms via exact
    // integer arithmetic (ticks·1000//timescale) on both engines.
    graft.QueryDef("q324_mp4_meta",
      (s, d) => {
        import s.implicits._
        graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions(_.map { id =>
            val ts = Array(600, 1000, 90000)((id % 3).toInt)
            val dur = 1000 + (id % 5000)
            val full = Mp4Codec.encode(ts, dur.toInt, 1 + (id % 3).toInt,
              16 * (1 + (id % 20).toInt), 16 * (1 + ((id / 2) % 15).toInt),
              (id % 300).toInt)
            val payload = if (id % 43 == 0) full.take(40) else full
            try {
              val (brand, pts, pdur, nt, w, h) = Mp4Codec.decodeMeta(payload)
              (id, brand, pts, pdur * 1000L / pts, nt, w, h)
            } catch { case _: Exception => (id, "corrupt", 0, 0L, 0, 0, 0) }
          })
          .toDF("doc_id", "brand", "timescale", "duration_ms", "n_traks",
            "width", "height")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
             |         ELSE 90000 END AS ts,
             |    1000 + doc_id % 5000 AS dur
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 43 = 0 THEN 'corrupt' ELSE 'isom' END AS brand,
             |  CAST(CASE WHEN doc_id % 43 = 0 THEN 0 ELSE ts END AS INT)
             |    AS timescale,
             |  CAST(CASE WHEN doc_id % 43 = 0 THEN 0
             |       ELSE dur * 1000 // ts END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN doc_id % 43 = 0 THEN 0
             |       ELSE 1 + doc_id % 3 END AS INT) AS n_traks,
             |  CAST(CASE WHEN doc_id % 43 = 0 THEN 0
             |       ELSE 16 * (1 + doc_id % 20) END AS INT) AS width,
             |  CAST(CASE WHEN doc_id % 43 = 0 THEN 0
             |       ELSE 16 * (1 + (doc_id // 2) % 15) END AS INT) AS height
             |FROM p ORDER BY doc_id""".stripMargin)),

    // REAL compressed-audio DECODE gate (the q294 pattern one codec
    // deeper): planted tone → PCM16 → IMA-ADPCM 4-bit encode → REAL
    // adaptive decode → Goertzel detection over the RECONSTRUCTED
    // samples. The oracle knows band/frequency/sample-count/compressed
    // size arithmetically, so a wrong step-table entry, index clamp,
    // or nibble order turns the tone into broadband noise and flips
    // the detected band. adpcm_bytes pins the exact 4:1 layout.
    graft.QueryDef("q325_adpcm_decode",
      (s, d) => {
        import s.implicits._
        val probes = Array(500.0, 1000.0, 2000.0, 3000.0)
        graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions(_.map { id =>
            val n = 1600 + (id % 800).toInt
            val pcm = WavCodec.decodeSamples(
              WavCodec.encodeTone(n, probes((id % 4).toInt), 8000))
            val adpcm = AdpcmCodec.encode(pcm)
            val back = AdpcmCodec.decode(adpcm, n)
            val powers = probes.map(f => WavCodec.goertzel(back, f, 8000))
            val det = powers.indices.maxBy(i => powers(i))
            (id, det, probes(det).toInt, n.toLong, adpcm.length.toLong)
          })
          .toDF("doc_id", "band", "freq_hz", "n_samples", "adpcm_bytes")
          .select(col("doc_id"), col("band").cast("int").as("band"),
            col("freq_hz").cast("int").as("freq_hz"), col("n_samples"),
            col("adpcm_bytes"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(doc_id % 4 AS INT) AS band,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN 500 WHEN 1 THEN 1000
             |       WHEN 2 THEN 2000 ELSE 3000 END AS INT) AS freq_hz,
             |  CAST(1600 + doc_id % 800 AS BIGINT) AS n_samples,
             |  CAST(4 + (1600 + doc_id % 800) // 2 AS BIGINT) AS adpcm_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL video DECODE gate: MJPEG frames in a spec-exact AVI/RIFF
    // container — our own chunk walk finds every movi 00dc payload and
    // the JDK's real JPEG decoder must produce pixels at the declared
    // dimensions for each (n_decoded counts successes; a dimension lie
    // or damaged frame fails the walk → per-record quarantine via the
    // %47 truncation plant).
    graft.QueryDef("q326_mjpeg_video",
      (s, d) => {
        import s.implicits._
        graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions(_.map { id =>
            val w = 16 * (1 + (id % 10).toInt)
            val h = 16 * (1 + ((id / 2) % 8).toInt)
            val nf = 1 + (id % 4).toInt
            val usPf = Array(33333, 40000, 66667)((id % 3).toInt)
            val full = AviCodec.encode(w, h, nf, usPf, seed = id.toInt)
            val payload = if (id % 47 == 0) full.take(60) else full
            try {
              val (pw, ph, decl, pus, dec) = AviCodec.decode(payload)
              (id, "ok", pw, ph, decl.toLong, dec.toLong,
                decl.toLong * pus / 1000L)
            } catch { case _: Exception =>
              (id, "corrupt", 0, 0, 0L, 0L, 0L)
            }
          })
          .toDF("doc_id", "status", "width", "height", "n_frames",
            "n_decoded", "duration_ms")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, 16 * (1 + doc_id % 10) AS w,
             |    16 * (1 + (doc_id // 2) % 8) AS h,
             |    1 + doc_id % 4 AS nf,
             |    CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 40000
             |         ELSE 66667 END AS uspf
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 47 = 0 THEN 'corrupt' ELSE 'ok' END AS status,
             |  CAST(CASE WHEN doc_id % 47 = 0 THEN 0 ELSE w END AS INT) AS width,
             |  CAST(CASE WHEN doc_id % 47 = 0 THEN 0 ELSE h END AS INT) AS height,
             |  CAST(CASE WHEN doc_id % 47 = 0 THEN 0 ELSE nf END AS BIGINT)
             |    AS n_frames,
             |  CAST(CASE WHEN doc_id % 47 = 0 THEN 0 ELSE nf END AS BIGINT)
             |    AS n_decoded,
             |  CAST(CASE WHEN doc_id % 47 = 0 THEN 0
             |       ELSE nf * uspf // 1000 END AS BIGINT) AS duration_ms
             |FROM p ORDER BY doc_id""".stripMargin)))
}
