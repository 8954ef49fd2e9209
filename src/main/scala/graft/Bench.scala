package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every declared query at the driver-chosen
  * scale factor and prints one JSON line. A warmup pass first absorbs
  * one-time JVM/codegen/parquet-footer costs so per-query numbers
  * reflect steady-state plan execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table (footer/schema caches) and exercise
    // codegen + shuffle machinery once.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    Tables.events(spark, sfDir).count()
    spark.range(1000000).selectExpr("sum(id)").collect()
    // one-time Structured Streaming init (state-store provider classes,
    // checkpoint plumbing) so streaming queries measure steady state
    locally {
      import org.apache.spark.sql.functions.{col, count => cnt}
      val rows = spark.range(8).select(
        org.apache.spark.sql.functions.current_timestamp().as("ts"),
        col("id")).collect()
      stream.StreamOps.runBounded(spark,
        spark.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType)))),
        df => df.groupBy(org.apache.spark.sql.functions.window(col("ts"), "5 minutes"))
          .agg(cnt(org.apache.spark.sql.functions.lit(1))))
    }

    // A failed query must be VISIBLE in the bench line (time -1 + an
    // errors map), never a healthy-looking small wall-time.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable =>
                  Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nErr = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_errors":$nErr,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
