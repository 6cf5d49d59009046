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

  /** `events.ts` normalized to microsecond TIMESTAMP_NTZ, whatever the
    * file encodes. The driver has shipped the column two ways across
    * rounds, so the reader dispatches on the footer schema:
    *
    *  - parquet TIMESTAMP(NANOS): Spark rejects it by default
    *    (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` (set here,
    *    belt-and-braces with the Verify/Bench/test session builders) it
    *    reads as a long of ns since epoch, converted with integer `ts
    *    div 1000` — never double division — matching DuckDB's silent
    *    ns→µs truncation bit for bit on the positive (post-1970)
    *    fixture range. Same recipe for a raw BIGINT ns column.
    *  - parquet TIMESTAMP(MICROS) (the r7 regeneration): already µs;
    *    both engines read it directly, so the only work is the NTZ
    *    re-label (an identity under the pinned UTC sessions).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
