package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A named engine operator exposed through [[SparkEntry]]: a Spark
  * implementation plus, when SQL-expressible, a DuckDB oracle query over the
  * same parquet tables (driver correctness gate, see TESTDATA.md). Operators
  * without an oracle get the driver's weaker rows-only check.
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Fixture-table loaders (driver-generated parquet; TESTDATA.md). */
object T {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (readable only via
    * `spark.sql.legacy.parquet.nanosAsLong`, set in [[Session]]) and as plain
    * TIMESTAMP(MICROS) without timezone, which Spark reads as TIMESTAMP_NTZ.
    * Normalize both to a session-TZ TIMESTAMP (sessions run UTC, so the
    * NTZ→LTZ cast is instant-preserving) so every consumer can use
    * `unix_micros`/windowing uniformly. The DuckDB oracle reads either
    * encoding natively at micros precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // NOTE: integral DIV, not `/` (double division loses precision above
      // 2^53 — epoch-nanos are ~1.7e18).
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
}

/** Numeric-parity helpers for the DuckDB oracle compare.
  *
  * Double summation is order-dependent; Spark's partitioned sums and DuckDB's
  * sequential sums would differ in the low bits and fail the driver's
  * hash-match. Money-like doubles in the fixtures carry exact 2-decimal
  * values, so casting to decimal first makes every aggregate exact and
  * order-independent; the final cast back to double is then bit-identical in
  * both engines.
  */
object Num {
  val one: Column = lit(new java.math.BigDecimal("1.00")) // decimal(3,2)

  def dec2(c: Column): Column  = c.cast(DecimalType(18, 2))
  def rate(c: Column): Column  = c.cast(DecimalType(3, 2)) // discounts/taxes in [0,1)
  def dsum(c: Column): Column  = sum(dec2(c)).cast(DoubleType)
  def davg(c: Column): Column  = (sum(dec2(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** SQL (DuckDB) forms of the same helpers. */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDavg(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x) AS DOUBLE)"
}
