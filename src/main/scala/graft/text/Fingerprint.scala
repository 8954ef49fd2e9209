package graft.text

/** Document fingerprinting via rolling hash + winnowing.
  *
  * Rolling hash: polynomial hash of each k-character window, computed
  * incrementally in O(1) per step (Rabin–Karp style, base 257, modulus
  * 2^61−1). Winnowing: within every window of `w` consecutive k-gram
  * hashes keep the minimum (rightmost on ties) — the standard local
  * fingerprinting scheme whose selected hashes are stable under edits
  * outside the window.
  *
  * Pure function → usable in `Dataset.map` at any scale; the fingerprint
  * set is what near-dup retrieval indexes (one posting per selected
  * hash), giving edit-local dedup that md5-style whole-document
  * fingerprints (q23) cannot.
  */
object Fingerprint {

  private val Mod = (1L << 61) - 1
  private val Base = 257L

  /** mulmod under 2^61-1 via 128-bit intermediate. */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod (2^61-1)
    val lo61 = lo & Mod
    val rest = (hi << 3) | (lo >>> 61)
    var r = lo61 + rest
    while (r >= Mod) r -= Mod
    r
  }

  /** Rolling k-gram hashes, one per window start. */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    require(k >= 1)
    if (text.length < k) return Array.empty
    val n = text.length - k + 1
    val out = new Array[Long](n)
    var h = 0L
    var basePowK1 = 1L // Base^(k-1)
    var i = 0
    while (i < k) {
      h = (mulMod(h, Base) + text.charAt(i)) % Mod
      if (i < k - 1) basePowK1 = mulMod(basePowK1, Base)
      i += 1
    }
    out(0) = h
    var s = 1
    while (s < n) {
      val outgoing = mulMod(text.charAt(s - 1).toLong, basePowK1)
      h = h - outgoing
      if (h < 0) h += Mod
      h = (mulMod(h, Base) + text.charAt(s + k - 1)) % Mod
      out(s) = h
      s += 1
    }
    out
  }

  /** Winnowed fingerprint: minimum hash of every `w`-window of k-gram
    * hashes (rightmost minimum on ties), deduplicated, sorted. */
  def winnow(text: String, k: Int = 5, w: Int = 4): Vector[Long] = {
    val hs = rollingHashes(text, k)
    if (hs.isEmpty) return Vector.empty
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    val last = math.max(0, hs.length - w)
    while (start <= last) {
      var minIdx = start
      var i = start
      val end = math.min(start + w, hs.length)
      while (i < end) {
        if (hs(i) <= hs(minIdx)) minIdx = i
        i += 1
      }
      selected += hs(minIdx)
      start += 1
    }
    selected.toVector
  }

  /** Containment of a's fingerprint in b's — the near-dup score used with
    * winnowed sets (asymmetric; use max of both directions for symmetry). */
  def containment(a: Vector[Long], b: Vector[Long]): Double =
    if (a.isEmpty) 0.0
    else a.count(b.toSet).toDouble / a.size
}
