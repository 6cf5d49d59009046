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

    // dask groupby().apply(fn) — the frame-per-group escape hatch. Typed
    // KeyValueGroupedDataset.flatMapGroups; fn demeans each user's values.
    // The group is buffered in memory — exactly dask's contract (one group
    // must fit a worker); when fn IS expressible declaratively, the 100 TB
    // form is the window-average twin the oracle uses. The mean is the
    // davg recipe in Scala (exact cents sum → correctly-rounded double →
    // IEEE divide), so `value - mean` is bit-identical in both engines
    // with NO rounding: rounding to 6 dp here actually diverged (a result
    // landed on a .5·10⁻⁶ shortest-repr boundary where Spark's decimal
    // HALF_UP and DuckDB's binary rounding disagree) — raw IEEE doubles
    // from identical inputs are the stronger determinism contract.
    "udf_group_apply" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (uid, it) =>
          val rows = it.toArray
          var cents = 0L
          rows.foreach(r => cents += math.round(r._3 * 100))
          val mean = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(cents), 2).doubleValue / rows.length
          rows.iterator.map { case (_, eid, v) => (uid, eid, v - mean) }
        }
        .toDF("user_id", "event_id", "demeaned")
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
    "udf_group_apply" ->
      """SELECT user_id, event_id,
        |value -
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id) AS DOUBLE)
        |  / COUNT(value) OVER (PARTITION BY user_id) AS demeaned
        |FROM events ORDER BY event_id""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id,
        |CAST(generate_subscripts(string_split_regex(text, ' '), 1) - 1
        |  AS INTEGER) AS pos,
        |unnest(string_split_regex(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, pos""".stripMargin
  )
}
