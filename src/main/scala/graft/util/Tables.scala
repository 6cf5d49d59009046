package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated fixture tables.
  *
  * Capability surface mirrors the reference engine's source layer
  * (dask.dataframe `read_parquet` / `read_csv` / `read_json`): parquet is the
  * primary columnar source; schema comes from the file footer (self-
  * describing), exactly like the reference's `_meta` inference.
  *
  * 100 TB notes: `spark.read.parquet` scales to any number of files /
  * partitions; column pruning + predicate pushdown reach the scan
  * automatically via Catalyst (`V2ScanRelationPushDown`). Nothing here
  * collects to the driver.
  */
object Tables {

  /** Every fixture table, in one place (Bench warm-up iterates this;
    * scripts/oracle_check.py keeps a Python twin of the same list). */
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects by default
    * (PARQUET_TYPE_ILLEGAL). Read it as a long (ns since epoch) and convert
    * to microsecond TIMESTAMP_NTZ — integer `div` 1000, never double
    * division, so the value matches DuckDB's silent ns→µs truncation bit for
    * bit. Under the UTC session the NTZ cast is an identity re-label.
    *
    * The nanosAsLong conf is also set once in the Verify/Bench/test session
    * builders; the set here is belt-and-braces for ad-hoc sessions. `ts div
    * 1000` matches DuckDB's ns→µs truncation for non-negative (post-1970)
    * epochs — the fixture range (2024) is safely positive.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
}
