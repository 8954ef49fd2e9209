package graft.ops

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
}
