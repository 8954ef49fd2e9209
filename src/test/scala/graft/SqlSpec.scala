package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: spark.sql over registered views matches the
  * DataFrame-built gate queries, and graft_dot works from SQL. */
class SqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("SQL text of the oracle (Spark dialect subset) matches the DataFrame plan results") {
    Sql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect().toSeq
    val viaDf = {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, sf).groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n")).orderBy("l_returnflag", "l_linestatus")
        .collect().toSeq
    }
    assert(viaSql == viaDf)
  }

  test("graft_dot is callable from SQL (GraftExtensions injection)") {
    Sql.registerTables(spark, sf)
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS sq FROM embeddings ORDER BY vec_id LIMIT 3")
      .collect()
    assert(r.length == 3)
    assert(r.forall(_.getDouble(1) > 0.0))
  }

  test("events view exposes the converted microsecond timestamp") {
    Sql.registerTables(spark, sf)
    val t = spark.sql("SELECT typeof(ts) FROM events LIMIT 1").collect().head.getString(0)
    assert(t == "timestamp")
  }
}
