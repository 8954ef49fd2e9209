package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale toolkit: the shuffle-shaping helpers a 100 TB deployment needs
  * beyond AQE's automatic handling — two-phase (salted) aggregation for
  * heavy-hitter keys, salted broadcast-replicated joins for skewed join
  * keys, and bucketed co-located joins that eliminate the shuffle
  * entirely for repeated joins on the same key.
  */
object Scale {

  /** Two-phase aggregation for skewed group keys: phase 1 aggregates
    * (key, salt) over `salt` times more partitions spreading each heavy
    * key across the cluster; phase 2 merges the partials. Only algebraic
    * aggregates compose this way — count and sum are provided; avg =
    * sum/count downstream.
    *
    * AQE's skew handling only splits *join* partitions; a single hot
    * GROUP BY key still lands one reducer without salting. (Spark's
    * partial aggregation already covers this when upstream map output is
    * spread; explicit salting matters when the input is pre-partitioned
    * by the hot key, e.g. after an upstream join on it.)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                salt: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        sumCols.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("n"),
        sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")): _*)
  }

  /** Skewed inner equi-join: salt the big side, replicate the small side
    * across the salt space. Correct for arbitrary skew; costs
    * `salt`× duplication of the small side, so use for moderately-sized
    * build sides that exceed broadcast limits but have hot keys. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(pmod(hash(col(key), monotonically_increasing_id()), lit(salt)) + lit(salt), lit(salt)))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key; subsequent joins on that
    * key are co-located — zero exchange (verified in ScaleSpec by plan
    * inspection). The 100 TB pattern for dimension/fact tables joined
    * repeatedly on the same key. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Drop a managed table AND its warehouse directory — the in-memory
    * catalog forgets tables between JVMs while the directory survives,
    * so a fresh session's overwrite would otherwise collide. */
  private def dropBucketed(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  /** Driver-visible gate for the bucketed co-located join: q07's exact
    * semantics, but the fact tables are first WRITTEN bucketed by the
    * join key and the join then runs with zero exchange on either side
    * (plan asserted in PlanSpec; values must equal q07's oracle). The
    * measured cost intentionally includes the bucketed write — that is
    * the real amortization decision at 100 TB: pay one layout write,
    * then every repeated fact⋈fact join on that key skips its shuffle. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q65_bucketed_join",
      (s, d) => {
        import graft.QueryDef.dec
        // per-sf table names: one session may gate several scale factors
        val tag = math.abs(d.hashCode).toString
        val lt = s"q65_lineitem_$tag"
        val ot = s"q65_orders_$tag"
        Seq(lt, ot).foreach(dropBucketed(s, _))
        // layout writes carry only the join-relevant projection — the
        // production shape (a bucketed layout is a materialized view for
        // a known join, not a full-table copy) and most of this query's
        // measured cost
        writeBucketed(Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount")),
          lt, "o_orderkey", 16)
        writeBucketed(Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          ot, "o_orderkey", 16)
        s.table(lt)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .join(s.table(ot), "o_orderkey")
          .groupBy("o_orderpriority")
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Per-group top-k through the bounded TopK fold (Folds.TopK): top-5
    // docs per source by token count. A row_number window would sort
    // each source's entire shard in one task; the fold's buffer caps at
    // k everywhere, so the shuffle moves <= k rows per (partition,
    // source). Oracle uses the window formulation — same rows, the
    // physical shape is exactly what differs.
    QueryDef("q86_topk_per_group",
      (s, d) => {
        import s.implicits._
        val topk = new graft.functions.Folds.TopK(5)
        Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("double").as("score"),
            col("doc_id"))
          .as[(String, Double, Long)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(topk.toColumn.name("top"))
          .flatMap { case (src, top) =>
            top.iterator.zipWithIndex.map { case ((score, id), i) =>
              (src, (i + 1).toLong, id, score.toLong) } }
          .toDF("source", "rank", "doc_id", "n_tok")
          .orderBy("source", "rank")
      },
      Some("""SELECT source, rank, doc_id, n_tok FROM (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY len(string_split(text, ' ')) DESC, doc_id)
             |      AS BIGINT) AS rank
             |  FROM documents) t
             |WHERE rank <= 5
             |ORDER BY source, rank""".stripMargin))
  )
}
