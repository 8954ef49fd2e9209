package graft.ops

import graft.{Materialize, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over the corpus token stream (✚ extension): the
  * bounded-memory frequency structure a 100 TB pipeline broadcasts to
  * probe token frequencies without carrying the full vocabulary.
  *
  * Construction is pure aggregation, so it is mergeable by construction:
  * cell(row i, bucket b) = Σ counts of tokens with h_i(tok) = b, built
  * with ordinary partial aggregation (map-side combine collapses hot
  * tokens before the shuffle, the same story as exact dedup q24). The
  * sketch is d×w rows TOTAL (4×1024 here) regardless of corpus size —
  * at 100 TB the cells table broadcasts in KBs while the true
  * vocabulary would not. Estimates are the classic min over rows:
  * est(tok) = min_i cell(i, h_i(tok)) ≥ true count, with overcount
  * ≤ e/w · N at probability 1−e^−d.
  *
  * Hash family: row i reads hex chars [8i+1, 8i+8) of md5(tok) — the
  * same one-digest-sliced-into-independent-words trick as the MinHash
  * components (Dedup.scala), so the oracle mirrors it exactly
  * (DuckDB `('0x' || substr(md5(tok), …))::BIGINT`, the proven q56
  * pattern).
  */
object Sketch {

  val width = 1024
  val depth = 4

  /** Bucket of `tok` in sketch row `i`: 32 md5 bits → [0, w). `w` is
    * overridable so specs can shrink the sketch to a HOSTILE width where
    * every bucket collides — the one-sided bound is only exercised where
    * collisions actually occur (at w=1024 most estimates are exact). */
  private def bucket(tok: Column, i: Int, w: Int = width): Column =
    conv(substring(md5(tok), 8 * i + 1, 8), 16, 10).cast("long") % w

  /** Exact per-token counts — the input the sketch compresses. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))

  /** The d×w cells table. One pass: each token row fans out to its
    * `depth` (row, bucket) coordinates via posexplode — never a
    * union-of-branches that would re-run the count aggregation. */
  def countMinCells(counts: DataFrame, w: Int = width): DataFrame =
    counts
      .select(col("n"),
        posexplode(array((0 until depth).map(i => bucket(col("tok"), i, w)): _*))
          .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(sum(col("n")).as("cell"))

  /** Point estimates for `probes` (one column `tok`): min cell across
    * the sketch's rows. The cells side is broadcast — at any corpus
    * size it is d×w rows. LEFT join: an empty bucket counts as zero
    * mass, so a probe with any empty bucket isn't dropped from the min
    * (which would inflate its estimate off its nonempty rows alone). A
    * never-seen token thus estimates 0 whenever at least one of its d
    * buckets is empty; if all d collide with real tokens it keeps the
    * standard positive CMS overcount. */
  def estimate(cells: DataFrame, probes: DataFrame, w: Int = width): DataFrame =
    probes
      .select(col("tok"),
        posexplode(array((0 until depth).map(i => bucket(col("tok"), i, w)): _*))
          .as(Seq("row", "bucket")))
      .join(broadcast(cells), Seq("row", "bucket"), "left")
      .groupBy("tok").agg(min(coalesce(col("cell"), lit(0L))).as("est_n"))

  /** Cells built directly from a raw token stream (one column `tok`),
    * skipping the exact per-token count: the shuffle is keyed by
    * (row, bucket) — at most d×w distinct keys, collapsed map-side to
    * ≤ d×w rows per input partition REGARDLESS of vocabulary size.
    * This is the build a 100 TB corpus uses; [[countMinCells]] over an
    * existing count table produces identical cells. */
  def countMinCellsOf(toks: DataFrame, w: Int = width): DataFrame =
    toks
      .select(posexplode(array((0 until depth).map(i => bucket(col("tok"), i, w)): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cell"))

  /** Heavy hitters via sketch-as-filter — the two-pass production
    * pattern. Pass 1: build the d×w cells from the raw stream (bounded
    * shuffle above). Pass 2: re-stream tokens, compute each
    * occurrence's estimate with d broadcast joins (map-side — the
    * stream itself never shuffles), admit occurrences whose estimate
    * clears `frac`·total (no false negatives: est ≥ truth), and
    * exact-count ONLY the admitted tokens — the exact aggregation's key
    * space is the candidate set, never the vocabulary. Sketch false
    * positives are then dropped exactly (`n ≥ frac·total`). */
  def heavyHitters(docs: DataFrame, frac: Double = 0.02,
      materialize: Materialize.Strategy = Materialize.local): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val cells = materialize(countMinCellsOf(toks)) // probed d times below
    val est = (0 until depth).foldLeft(toks) { (df, i) =>
      df.join(broadcast(cells.where(col("row") === i)
          .select(col("bucket").as(s"b$i"), col("cell").as(s"c$i"))),
        bucket(col("tok"), i) === col(s"b$i"))
        .drop(s"b$i")
    }.withColumn("est_n", least((0 until depth).map(j => col(s"c$j")): _*))
    // total token mass is conserved by every sketch row (SketchSpec
    // asserts it), so the scalar comes from the 4096-row checkpoint —
    // not a third pass over the corpus
    est
      .crossJoin(broadcast(cells.where(col("row") === 0)
        .agg(sum(col("cell")).as("total"))))
      .where(col("est_n") >= col("total") * frac)
      .groupBy("tok", "est_n", "total").agg(count(lit(1)).as("n"))
      .where(col("n") >= col("total") * frac)
      .select(col("tok"), col("n"), col("est_n"))
  }

  val defs: Seq[QueryDef] = Seq(
    // The exact top-20 tokens with their sketch estimates alongside the
    // truth: est_n ≥ n always; the margin IS the sketch's documented
    // error at this corpus/width ratio.
    QueryDef("q79_countmin",
      (s, d) => {
        val tc = tokenCounts(Tables.documents(s, d)).localCheckpoint()
        val top = tc.orderBy(col("n").desc, col("tok")).limit(20)
        top.join(estimate(countMinCells(tc), top.select("tok")), "tok")
          .select(col("tok"), col("n"), col("est_n"))
          .orderBy("tok")
      },
      Some(s"""WITH tc AS (
             |  SELECT tok, COUNT(*) AS n
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
             |  GROUP BY tok),
             |coords AS (
             |  SELECT tok, n, i.i AS row,
             |    ('0x' || substr(md5(tok), i.i * 8 + 1, 8))::BIGINT % $width AS bucket
             |  FROM tc, (SELECT unnest(range($depth)) AS i) i),
             |cells AS (SELECT row, bucket, CAST(SUM(n) AS BIGINT) AS cell
             |          FROM coords GROUP BY row, bucket),
             |top AS (SELECT tok, n FROM tc ORDER BY n DESC, tok LIMIT 20),
             |lk AS (
             |  SELECT t.tok, t.n, i.i AS row,
             |    ('0x' || substr(md5(t.tok), i.i * 8 + 1, 8))::BIGINT % $width AS bucket
             |  FROM top t, (SELECT unnest(range($depth)) AS i) i)
             |SELECT lk.tok, lk.n, MIN(c.cell) AS est_n
             |FROM lk JOIN cells c ON c.row = lk.row AND c.bucket = lk.bucket
             |GROUP BY lk.tok, lk.n
             |ORDER BY tok""".stripMargin)),

    // Sketch-as-filter heavy hitters at 2% of the token stream. The
    // oracle computes the same VALUES from the distinct-token side
    // (per-token estimates are constant across occurrences, so
    // admit-then-count equals count-then-admit); the Spark plan is the
    // streaming shape (see heavyHitters).
    QueryDef("q80_heavy_hitters",
      (s, d) => heavyHitters(Tables.documents(s, d)).orderBy("tok"),
      Some(s"""WITH toks AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |tc AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
             |coords AS (
             |  SELECT tok, n, i.i AS row,
             |    ('0x' || substr(md5(tok), i.i * 8 + 1, 8))::BIGINT % $width AS bucket
             |  FROM tc, (SELECT unnest(range($depth)) AS i) i),
             |cells AS (SELECT row, bucket, CAST(SUM(n) AS BIGINT) AS cell
             |          FROM coords GROUP BY row, bucket),
             |est AS (SELECT c.tok, c.n, MIN(cl.cell) AS est_n
             |        FROM coords c JOIN cells cl
             |          ON cl.row = c.row AND cl.bucket = c.bucket
             |        GROUP BY c.tok, c.n),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks)
             |SELECT tok, n, est_n
             |FROM est, tot
             |WHERE est_n >= total * 0.02 AND n >= total * 0.02
             |ORDER BY tok""".stripMargin))
  )
}
