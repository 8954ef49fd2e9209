package graft.text

/** Heuristic language identification (n-gram + stopword profiles) — the
  * library-grade scorer behind the SQL-twin heuristic in q22_lang_id.
  * Pure function, usable inside Dataset.map at any scale (no state, no
  * broadcast needed; profiles are compile-time constants).
  */
object LangId {

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "zu"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "es", "en", "un"),
    "fr" -> Set("le", "la", "les", "de", "et", "est", "un", "une", "que", "dans"),
  )

  // characteristic character n-grams (weight 2 per hit)
  private val charMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "ing", "tion"),
    "de" -> Seq("sch", "ch", "ei", "ß", "ü", "ö", "ä"),
    "es" -> Seq("ñ", "¿", "¡", "ción", "ll"),
    "fr" -> Seq("ç", "è", "é", "eau", "oux", "'"),
  )

  private def isCjk(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.HANGUL_SYLLABLES ||
    b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA
  }

  /** Per-language scores (higher = more likely). */
  def scores(text: String): Map[String, Double] = {
    val lower = text.toLowerCase
    val tokens = lower.split("\\s+").filter(_.nonEmpty)
    val n = math.max(1, tokens.length)
    val cjkRatio = if (lower.isEmpty) 0.0
      else lower.count(isCjk).toDouble / lower.length
    val base = stopwords.map { case (lang, words) =>
      val stopHits = tokens.count(words.contains).toDouble / n
      val markerHits = charMarkers(lang).map { m =>
        var c = 0; var i = lower.indexOf(m)
        while (i >= 0) { c += 1; i = lower.indexOf(m, i + 1) }
        c
      }.sum.toDouble / math.max(1, lower.length / 4)
      lang -> (stopHits + 2.0 * markerHits)
    }
    base + ("zh" -> 5.0 * cjkRatio)
  }

  /** Best guess, or "unknown" when nothing scores. */
  def detect(text: String): String = {
    val s = scores(text)
    val (lang, best) = s.maxBy(_._2)
    if (best <= 0.0) "unknown" else lang
  }
}
