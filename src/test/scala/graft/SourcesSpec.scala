package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the parquet gate tables: CSV,
  * JSON-lines and text round-trips through `spark.read`/`write` must
  * reproduce the parquet-sourced values exactly (the reference's
  * file-source surface, SURVEY §2.1 S5, is format-agnostic bytes; on
  * Spark the format-aware sources are the idiomatic equivalent). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def tmp(suffix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_src_$suffix")
    d.toFile.deleteOnExit()
    d.toString + "/out"
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getLong(2)}")
      .sorted.toSeq

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars") // text column has commas/quotes
  private lazy val expected = canon(Tables.documents(spark, sf))

  test("CSV round-trip preserves values (header + schema read-back)") {
    val p = tmp("csv")
    docs.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars LONG").csv(p)
    assert(canon(back) == expected)
  }

  test("JSON-lines round-trip preserves values") {
    val p = tmp("json")
    docs.write.json(p)
    val back = spark.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(p)
    assert(canon(back) == expected)
  }

  test("ORC round-trip preserves values (schema carried by the format)") {
    val p = tmp("orc")
    docs.write.orc(p)
    assert(canon(spark.read.orc(p)) == expected)
  }

  test("text sink + distributed split reads records back") {
    // text format writes one string column; round-trip through the
    // library's own splitter path
    val p = tmp("txt")
    docs.select(concat_ws("|", col("doc_id"), col("lang"), col("n_chars")).as("value"))
      .write.text(p)
    val back = spark.read.text(p)
      .select(split(col("value"), "\\|").as("f"))
      .select(col("f").getItem(0).cast("long").as("doc_id"),
        col("f").getItem(1).as("lang"),
        col("f").getItem(2).cast("long").as("n_chars"))
    assert(canon(back) == expected)
  }

  test("hive-partitioned write prunes partitions at read time") {
    // the layout story next to q65's bucketing: partitionBy(lang) writes
    // lang=XX/ directories; a reader filtering on lang must touch ONLY
    // that directory (PartitionFilters in the scan, one partition listed)
    // — at 100 TB this is the difference between scanning 1/5 and 5/5 of
    // the corpus for a per-language job.
    val p = tmp("part")
    docs.write.partitionBy("lang").parquet(p)
    val back = spark.read.parquet(p).where(col("lang") === "en")
    val scan = back.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec"))
    assert(scan.partitionFilters.nonEmpty, "lang filter must prune partitions")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1,
      "only the lang=en directory may survive pruning")
    assert(canon(back) ==
      expected.filter(_.split('|')(1) == "en"), "pruned read returns exactly the en rows")
  }
}
