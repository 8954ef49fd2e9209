package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * All columns keep their parquet names so query output column names line
  * up with the DuckDB oracle (the driver's compare sorts columns by name).
  *
  * Scale note: these are plain parquet scans — filters/projections placed
  * on top are pushed into the scan by Catalyst (verified via
  * `.explain("formatted")`, see `PlanSpec`). At 100 TB the same loaders
  * work against a partitioned table root; nothing here materializes.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (arrives as Long
    * ns-since-epoch under nanosAsLong) and as TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ). Normalize either encoding to a
    * microsecond TIMESTAMP — with the session pinned to UTC this is
    * exactly the naive value DuckDB reads from the same file, so oracle
    * SQL can use `ts` directly and every downstream query sees one type
    * regardless of which corpus generation produced the file. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ → session-UTC TIMESTAMP: the wall-clock digits are
        // preserved, micros-since-epoch identical.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case other =>
        // Fail fast on a new corpus encoding (string, INT96, …) instead
        // of letting a blind cast surface as silent nulls downstream.
        throw new IllegalStateException(
          s"events.ts: unexpected parquet type $other; expected " +
            "TIMESTAMP(NANOS)-as-Long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
}
