package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.F — sorts / limits / top-k.
  *
  * Reference surface: `df.sort_values([a,b])`, `df.nlargest(k, col)`,
  * `groupby.apply(g.nlargest(k))`, `head(n)` after sort.
  *
  * 100 TB notes: `orderBy.limit(k)` plans as `TakeOrderedAndProject` —
  * per-partition partial top-k then a tree-reduce of k-element heaps, the
  * same plan shape as dask's `nlargest` chunk/combine; it never globally
  * sorts. `topk_per_group` is a window `row_number <= k` — one shuffle on
  * the group key, per-partition sort, no per-group materialization. The
  * global `sort_values` is a genuine RangePartitioner total sort (sampled
  * split points) — the one op whose cost is intrinsically global.
  *
  * Determinism: every ORDER BY (window and output) carries a unique-key
  * tie-break (SURVEY §7.2.3).
  */
object SortsTopK {

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // global multi-column sort (dd.sort_values) — range-partitioned
    "sort_values" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)),

    // global top-k (dd.nlargest): TakeOrderedAndProject partial top-k
    "sort_limit_topk" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)),

    // top-3 orders per customer — window row_number, one shuffle
    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    // pagination slice: sort → limit (never a bare limit — SURVEY §7.2.3)
    "limit_after_sort" -> ((s, d) =>
      customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(100))
  )

  val oracles: Map[String, String] = Map(
    "sort_values" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC"""
        .stripMargin,
    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "limit_after_sort" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 100""".stripMargin
  )
}
