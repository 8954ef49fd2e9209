package graft.ops

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale toolkit correctness + plan-shape guarantees. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("saltedAgg equals direct groupBy on a skewed input") {
    // skew: 90% of rows share one key
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(0)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val salted = Scale.saltedAgg(df, Seq("k"), Seq("v"), salt = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(salted.map(t => (t._1, t._2)).toSeq == direct.map(t => (t._1, t._2)).toSeq)
    salted.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s._3 - d._3) < 1e-6, s"sum for key ${s._1}")
    }
  }

  test("saltedJoin equals plain inner join on skewed keys") {
    val big = spark.range(20000)
      .select((col("id") % 3).as("k"), col("id").as("payload"))
    val small = spark.range(3).select(col("id").as("k"), (col("id") * 100).as("dim"))
    val direct = big.join(small, "k").agg(count(lit(1)), sum("dim"), sum("payload"))
      .collect().head
    val salted = Scale.saltedJoin(big, small, "k").agg(count(lit(1)), sum("dim"), sum("payload"))
      .collect().head
    assert(salted == direct)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory survives — clear both before writing
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("hive-style partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .partitionBy("l_returnflag").parquet(dir)
      val q = spark.read.parquet(dir).where(col("l_returnflag") === "A")
        .select("l_orderkey")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
        s"expected partition pruning:\n$plan")
      // only the A partition's rows are read
      val expected = Tables.lineitem(spark, sf).where(col("l_returnflag") === "A").count()
      assert(q.count() == expected)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
