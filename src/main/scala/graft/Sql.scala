package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: register the corpus as temp views so users can drive
  * the engine with `spark.sql(...)` — the third query lifecycle surface
  * (SURVEY.md §3: builder API ≙ Flow, DataFrame ≙ ops modules, SQL ≙
  * this). Views are lazy — registering costs nothing until queried, and
  * `graft_dot` is available in SQL via GraftExtensions. */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every corpus table of `dir` as a temp view. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
