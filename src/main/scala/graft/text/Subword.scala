package graft.text

/** Greedy longest-match subword tokenization against a pinned merge
  * vocabulary — the WordPiece-style inference half of a BPE tokenizer
  * (reference tokenization surface; the merges themselves are learned
  * offline, like the k-means centroids in ops/AnnCentroids.scala).
  *
  * Semantics: at each position take the LONGEST vocab entry matching
  * the remaining suffix; if none matches, fall back to the single next
  * character (byte-fallback, so any unicode word tokenizes without an
  * alphabet enumeration — zh text simply decomposes to characters).
  * Deterministic by construction: the match set at a position has at
  * most one entry per length.
  *
  * The vocab is the single source of truth for BOTH engines: the gate
  * query formats it verbatim into the DuckDB oracle's recursive-CTE
  * tokenizer, so Spark's loop and the oracle's recursion apply the
  * identical longest-match rule. All entries are BMP, where Scala's
  * UTF-16 substring and DuckDB's character substr agree on lengths.
  */
object Subword {

  /** Pinned ASCII merge table (a realistic mini-BPE: common English
    * affixes + frequent digrams). Order is irrelevant — matching is by
    * length — but keep it sorted for readability. */
  val vocab: Seq[String] = Seq(
    "the", "ing", "ion", "ent", "ati", "ter", "est", "ers",
    "an", "ar", "at", "ed", "en", "er", "es", "he", "in",
    "is", "it", "le", "nd", "on", "or", "ou", "re", "st", "th", "ti")

  private val byLengthDesc = vocab.sortBy(-_.length)

  /** SQL literal list for the oracle — same entries, same quoting. */
  def vocabSqlList: String = vocab.map(v => s"'$v'").mkString(", ")

  /** Greedy longest-match decomposition of one word. Runs per DISTINCT
    * word in the gate plan (weighted by stream counts afterwards), so
    * the loop's cost is vocabulary-bounded, not corpus-bounded. */
  def tokenize(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var rest = word
    while (rest.nonEmpty) {
      val l = byLengthDesc.find(rest.startsWith(_)).map(_.length).getOrElse(1)
      out += rest.substring(0, l)
      rest = rest.substring(l)
    }
    out.result()
  }
}
