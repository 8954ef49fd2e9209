package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents`: exact (hash-groupBy), MinHash
  * signatures + LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: exact dedup groups on md5(text) — the shuffle key is a
  * fixed 32-byte hash, never the raw document, so shuffle volume is
  * O(rows·32B) regardless of document size. MinHash/LSH is the 100 TB
  * near-dup path: candidates come from equality joins on band hashes
  * (shuffle on small fixed-width keys); the quadratic Jaccard check
  * (q27) is only run on candidates in a real pipeline — here it is also
  * declared standalone so the oracle can validate it.
  */
object Dedup {

  /** One row per (doc_id, word token) — the shingle relation. */
  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))

  private val nHashes = 4
  /** MinHash component i: min over tokens of md5(i ++ ":" ++ word). */
  private def minhashAgg(i: Int): Column =
    min(md5(concat(lit(s"$i:"), col("word")))).as(s"m$i")

  private def signatures(s: SparkSession, d: String): DataFrame =
    tokens(s, d).groupBy("doc_id")
      .agg(minhashAgg(0), (1 until nHashes).map(minhashAgg): _*)

  private val minhashSqlCols = (0 until nHashes)
    .map(i => s"min(md5('$i:' || word)) AS m$i").mkString(",\n  ")
  private val sigSql =
    s"""SELECT doc_id, $minhashSqlCols
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
       |GROUP BY doc_id""".stripMargin

  // SimHash: 32-bit, h(word) = first 8 hex chars of md5 parsed as int;
  // bit b of the sketch = majority vote of bit b over the doc's tokens.
  private val simBits = 32
  private def simhashSpark(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long")
    val votes = Seq.tabulate(simBits) { b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        .as(s"w$b")
    }
    val sketch = Seq.tabulate(simBits) { b =>
      when(col(s"w$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokens(s, d).distinct()
      .groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sketch.as("simhash"))
      .orderBy("doc_id")
  }
  private val simhashSql = {
    val votes = (0 until simBits).map { b =>
      s"sum(CASE WHEN ((('0x' || substr(md5(word), 1, 8))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS w$b"
    }.mkString(",\n    ")
    val sketch = (0 until simBits)
      .map(b => s"(CASE WHEN w$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""SELECT doc_id, CAST($sketch AS BIGINT) AS simhash FROM (
       |  SELECT doc_id, $votes
       |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
       |  GROUP BY doc_id) v
       |ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: group on the content hash, keep the smallest doc_id.
    QueryDef("q24_dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp"),
      Some("""SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin)),

    // MinHash signatures (k=4 hash functions over word shingles).
    QueryDef("q25_minhash_sig",
      (s, d) => signatures(s, d).orderBy("doc_id"),
      Some(s"$sigSql ORDER BY doc_id")),

    // LSH banding: 2 bands × 2 rows; candidate pairs = docs sharing a band
    // hash. Equality join on the band key — the near-dup join that scales.
    QueryDef("q26_lsh_candidates",
      (s, d) => {
        val sig = signatures(s, d)
        val bands = sig.select(col("doc_id"), lit(0).as("band"),
            md5(concat(col("m0"), col("m1"))).as("bh"))
          .union(sig.select(col("doc_id"), lit(1).as("band"),
            md5(concat(col("m2"), col("m3"))).as("bh")))
        val a = bands.select(col("band"), col("bh"), col("doc_id").as("id_a"))
        val b = bands.select(col("band"), col("bh"), col("doc_id").as("id_b"))
        a.join(b, Seq("band", "bh")).where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH sig AS ($sigSql),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || m1) AS bh FROM sig
              |  UNION ALL
              |  SELECT doc_id, 1 AS band, md5(m2 || m3) AS bh FROM sig)
              |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
              |WHERE a.doc_id < b.doc_id
              |ORDER BY id_a, id_b""".stripMargin)),

    // n-gram (n=1 shingle) Jaccard near-dup verification via inverted-
    // index self-join on distinct tokens. At scale this runs only on LSH
    // candidates (q26); declared standalone for the oracle.
    QueryDef("q27_ngram_jaccard",
      (s, d) => {
        val t = tokens(s, d).distinct()
        val sizes = t.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val shared = t.select(col("doc_id").as("id_a"), col("word"))
          .join(t.select(col("doc_id").as("id_b"), col("word")), "word")
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        shared
          .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
          .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
          .withColumn("jaccard",
            col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
          .where(col("jaccard") >= 0.8)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (
             |  SELECT DISTINCT doc_id, word FROM
             |    (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) x),
             |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
             |sh AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
             |  FROM t a JOIN t b ON a.word = b.word AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |  CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
             |FROM sh JOIN sz na ON sh.id_a = na.doc_id
             |        JOIN sz nb ON sh.id_b = nb.doc_id
             |WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // SimHash sketches (32-bit majority-vote fingerprint).
    QueryDef("q28_simhash", simhashSpark, Some(simhashSql))
  )
}
