package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-category op modules
  * (SURVEY.md §2 inventory); a key is declared with an oracle only after
  * its local DuckDB pre-flight (`scripts/oracle_check.py`) is green.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Scans.entries, ops.Scans.oracles),
      (ops.Projections.entries, ops.Projections.oracles),
      (ops.Joins.entries, ops.Joins.oracles),
      (ops.Aggregations.entries, ops.Aggregations.oracles),
      (ops.Windows.entries, ops.Windows.oracles),
      (ops.SortsTopK.entries, ops.SortsTopK.oracles),
      (ops.LlmOps.entries, ops.LlmOps.oracles),
      (ops.SetOps.entries, ops.SetOps.oracles),
      (ops.ScalarFns.entries, ops.ScalarFns.oracles),
      (ops.Preprocess.entries, ops.Preprocess.oracles),
      (ops.Udx.entries, ops.Udx.oracles),
      (ops.Streaming.entries, ops.Streaming.oracles),
      (ops.LlmExtras.entries, ops.LlmExtras.oracles),
      (ops.Curation.entries, ops.Curation.oracles),
      (ops.Composites.entries, ops.Composites.oracles),
      (ops.Selection.entries, ops.Selection.oracles),
      (ops.Retrieval.entries, ops.Retrieval.oracles),
      (ops.Ingest.entries, ops.Ingest.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary: scan → filter → project → groupBy →
    * decimal-exact sums/avgs → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregations.entries("agg_groupby_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.iterator.flatMap(_._1.keys).toSeq
    val dups = all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    require(dups.isEmpty,  // toMap would silently shadow the earlier module
      s"duplicate query keys across op modules: ${dups.mkString(", ")}")
    modules.iterator.flatMap(_._1).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
