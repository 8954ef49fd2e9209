package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** DCT perceptual hash semantics beyond the q356 oracle: the specific
  * invariance pHash buys (high-frequency noise vanishes in the low
  * block), what it must NOT be invariant to (low-frequency structure),
  * and decode determinism. */
class PHashSpec extends AnyFunSuite {
  private val P = Multimodal.PHash

  test("per-pixel checkerboard noise leaves the hash bit-identical (every class)") {
    for (seed <- 0 until 37) {
      val clean = P.phash64(P.encodeSmooth(seed, noisy = false))
      val noisy = P.phash64(P.encodeSmooth(seed, noisy = true))
      assert(clean == noisy, s"class $seed: high-frequency noise flipped bits " +
        f"(xor=${java.lang.Long.bitCount(clean ^ noisy)} bits)")
    }
  }

  test("distinct smooth classes never collide and differ in MANY bits") {
    val hs = (0 until 37).map(s => s -> P.phash64(P.encodeSmooth(s, noisy = false)))
    for (Seq((sa, a), (sb, b)) <- hs.combinations(2)) {
      val dist = java.lang.Long.bitCount(a ^ b)
      assert(dist >= 8, s"classes $sa/$sb too close: hamming $dist")
    }
  }

  test("encode -> decode -> hash is deterministic across calls") {
    val a = P.phash64(P.encodeSmooth(7, noisy = false))
    val b = P.phash64(P.encodeSmooth(7, noisy = false))
    assert(a == b)
  }

  test("a LOW-frequency change (what dedup must catch) changes the hash") {
    // different class = different low-frequency sign pattern; any two
    // classes differing proves low-frequency structure is visible —
    // pair with the invariance test, this pins that pHash is not
    // degenerate-constant
    val a = P.phash64(P.encodeSmooth(0, noisy = false))
    val b = P.phash64(P.encodeSmooth(1, noisy = false))
    assert(a != b)
  }

  test("non-32x32 input is rejected loudly") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val e = intercept[IllegalArgumentException] { P.phash64(out.toByteArray) }
    assert(e.getMessage.contains("32x32"))
  }
}
