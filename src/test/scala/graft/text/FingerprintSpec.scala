package graft.text

import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite {

  test("rolling hashes match direct per-window hashing") {
    val text = "the quick brown fox jumps"
    val k = 5
    val rolled = Fingerprint.rollingHashes(text, k)
    val direct = text.sliding(k).map { g =>
      g.foldLeft(0L)((h, c) => (BigInt(h) * 257 + c.toInt).mod(BigInt((1L << 61) - 1)).toLong)
    }.toArray
    assert(rolled.toSeq == direct.toSeq)
  }

  test("short text yields empty hashes, singleton window works") {
    assert(Fingerprint.rollingHashes("ab", 5).isEmpty)
    assert(Fingerprint.rollingHashes("abcde", 5).length == 1)
  }

  test("winnowing is edit-local: distant edits preserve most fingerprints") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = a.replace("today", "19xyz") // edit at the far end
    val fa = Fingerprint.winnow(a)
    val fb = Fingerprint.winnow(b)
    assert(Fingerprint.containment(fa, fb) > 0.7)
  }

  test("unrelated texts share few fingerprints") {
    val fa = Fingerprint.winnow("completely different content with other words entirely")
    val fb = Fingerprint.winnow("zxqv wklm pqrs tuvw 0123 4567 89ab cdef ghij")
    assert(Fingerprint.containment(fa, fb) < 0.2)
  }

  test("identical texts have containment 1.0 in both directions") {
    val f = Fingerprint.winnow("same text twice over")
    assert(Fingerprint.containment(f, f) == 1.0)
  }

  test("deterministic across calls") {
    val t = "determinism check string for fingerprints"
    assert(Fingerprint.winnow(t) == Fingerprint.winnow(t))
  }
}
