package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance: classify what changed between two
  * snapshots of a keyed corpus. The everyday operation behind
  * retraining decisions ("how much of the corpus moved since the last
  * run?") and incremental downstream refresh (re-embed / re-dedup only
  * the delta instead of the full 100 TB).
  *
  * Scale shape: each side is reduced to (key, 128-bit content digest)
  * BEFORE the shuffle — the full-outer join on the key then moves
  * ~24 bytes per row regardless of document size, and the classifier is
  * a per-row CASE on the joined digests. One co-partitioned shuffle
  * total; document text never leaves its scan. (Reference snapshot
  * semantics: flod pipelines re-run whole inputs — `pipeline.d` has no
  * incremental mode — so this is an extension operator, not a port.)
  */
object Delta {

  /** Rows of `newer` that are new, edited, or gone relative to `old`,
    * classified as added/changed/removed; unchanged rows (the vast
    * majority of a real snapshot pair) are dropped map-side after the
    * join. `payload` is the content whose digest defines "changed". */
  def snapshotDiff(old: DataFrame, newer: DataFrame, key: String,
                   payload: Column): DataFrame = {
    val o = old.select(col(key), md5(payload).as("old_digest"))
    val n = newer.select(col(key), md5(payload).as("new_digest"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("change") =!= "unchanged")
      .select(col(key), col("change"),
        coalesce(col("old_digest"), lit("")).as("old_digest"),
        coalesce(col("new_digest"), lit("")).as("new_digest"))
  }

  /** Gate: two deterministic snapshots derived from `documents` — v1
    * drops the doc_id%11 slice (those rows are "added" in v2), v2 drops
    * the %13 slice ("removed") and appends an edit marker to the %7
    * slice ("changed"). The oracle mirrors the derivation and the
    * full-outer classification. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q96_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.where(pmod(col("doc_id"), lit(11)) =!= 0)
        val v2 = docs.where(pmod(col("doc_id"), lit(13)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" v2-edit"))).otherwise(col("text")))
        snapshotDiff(v1, v2, "doc_id", col("text"))
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, md5(text) AS old_digest
             |  FROM documents WHERE doc_id % 11 <> 0),
             |v2 AS (
             |  SELECT doc_id,
             |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2-edit'
             |             ELSE text END) AS new_digest
             |  FROM documents WHERE doc_id % 13 <> 0)
             |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
             |  CASE WHEN v1.doc_id IS NULL THEN 'added'
             |       WHEN v2.doc_id IS NULL THEN 'removed'
             |       ELSE 'changed' END AS change,
             |  COALESCE(v1.old_digest, '') AS old_digest,
             |  COALESCE(v2.new_digest, '') AS new_digest
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
             |WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL
             |   OR v1.old_digest <> v2.new_digest
             |ORDER BY doc_id""".stripMargin))
  )
}
