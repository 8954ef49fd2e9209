package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The end-to-end LLM training-data preprocessing pipeline as ONE
  * declarative plan — the composition the individual gate queries exist
  * for: quality filter → exact dedup (keep the lowest doc_id per content
  * hash) → SimHash near-dup removal (drop the higher id of each pair
  * within Hamming radius 4) → deterministic hash-stratified
  * train/val/test split → per-(lang, split) stats.
  *
  * Scale shape: the filter is a narrow transform fused into the scan;
  * exact dedup shuffles 32-byte hashes; the near-dup stage reuses the
  * skew-safe blocked SimHash self-join (see [[Dedup.simhashNearDup]],
  * one materialized sketch table); the split is a pure hash (no rand,
  * no global sort); the final stats are a partial-aggregated groupBy on
  * a handful of keys. Nothing in the plan materializes the corpus to
  * the driver, and every stage's skew story is inherited from the
  * operator it composes.
  */
object Pipeline {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q56_pipeline_e2e",
      (s, d) => {
        val toks = size(split(col("text"), " ")).cast("long")
        val quality = Tables.documents(s, d)
          .withColumn("n_tokens", toks)
          .where(col("n_tokens").between(5, 10000))
        // exact dedup: representative = min doc_id per content hash
        val reps = quality.groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id"))
        val exact = quality.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
        // near-dup removal: drop the higher id of each close pair
        val dupIds = Dedup.simhashNearDup(exact, radius = 4)
          .select(col("id_b").as("doc_id")).distinct()
        val clean = exact.join(dupIds, Seq("doc_id"), "left_anti")
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        clean
          .withColumn("split",
            when(h < 80, "train").when(h < 90, "val").otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
          .orderBy("lang", "split")
      },
      Some(s"""WITH q AS (
             |  SELECT doc_id, text, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |  WHERE len(string_split(text, ' ')) BETWEEN 5 AND 10000),
             |reps AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
             |e AS (SELECT q.* FROM q WHERE q.doc_id IN (SELECT doc_id FROM reps)),
             |sk AS (${Dedup.simhashBodySqlFrom("e")}),
             |nd AS (
             |  SELECT DISTINCT b.doc_id
             |  FROM sk a JOIN sk b
             |    ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 4),
             |clean AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
             |labeled AS (
             |  SELECT lang, n_tokens,
             |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT lang, n_tokens,
             |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS h
             |        FROM clean) t)
             |SELECT lang, split, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
             |FROM labeled GROUP BY lang, split ORDER BY lang, split""".stripMargin))
  )
}
