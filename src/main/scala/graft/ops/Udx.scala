package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.L — user-defined function surface.
  *
  * Reference surface: `Series.map(fn)` (scalar), `df.map_partitions(fn)`
  * (THE dask escape hatch), frame-returning `apply` (generator/UDTF).
  *
  * Policy (SURVEY §4): built-in expressions everywhere a built-in exists —
  * UDFs block codegen and pushdown. These keys exist to prove the escape
  * hatches work, not as the default idiom:
  *  - `udf_scalar`: a Scala UDF (text normalizer);
  *  - `udf_map_partitions`: typed `Dataset.mapPartitions` — per-partition
  *    imperative logic, streams the iterator (no partition materialization,
  *    100 TB-safe);
  *  - `udtf_generator`: one-row→many fan-out via the built-in `posexplode`
  *    Generator (no custom Generator needed for the reference surface).
  */
object Udx {

  /** The normalizer the reference would write as `Series.map(fn)`. */
  private val normalizeUdf = udf((s: String) =>
    if (s == null) null else s.toLowerCase.replaceAll("\\s+", " ").trim)

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          normalizeUdf(col("text")).as("norm_text"))
        .withColumn("norm_len", length(col("norm_text")))
        .orderBy("doc_id")),

    // partition-wise imperative transform; iterator-streaming, typed
    "udf_map_partitions" -> ((s, d) => {
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      val out = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      events(s, d)
        .select(col("event_id"), col("value"))
        .as[(Long, Double)](enc)
        .mapPartitions(it =>
          it.map { case (id, v) => (id, math.round(v * 100)) })(out)
        .toDF("event_id", "cents")
        .orderBy("event_id")
    }),

    // generator: token stream with ordinal position per document
    "udtf_generator" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"))
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT doc_id,
        |trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
        |length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |  AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // round(value*100): the product sits within ~1e-10 of an integer, so
    // nearest-int rounding agrees between Math.round and DuckDB round
    "udf_map_partitions" ->
      """SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        |FROM events ORDER BY event_id""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id,
        |CAST(generate_subscripts(string_split_regex(text, ' '), 1) - 1
        |  AS INTEGER) AS pos,
        |unnest(string_split_regex(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, pos""".stripMargin
  )
}
