package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2.B — projection / filter / predicates.
  *
  * Reference surface: `df[['a','b']]`, `df.assign`, `df.rename/drop/astype`,
  * boolean-mask filters (`df[(df.a>x)&(df.b=='y')]`), `isin`, `between`,
  * `isna/fillna/dropna`, `np.where` conditional projection.
  *
  * All rows are single-pass narrow transformations: no shuffle except the
  * final presentation ORDER BY, and the filter/projection reach the parquet
  * scan via Catalyst pushdown. Per-row double arithmetic is IEEE-identical
  * across engines, so derived doubles need no decimal detour.
  */
object Projections {

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project_select" -> ((s, d) =>
      customer(s, d).select("c_custkey", "c_name").orderBy("c_custkey")),

    // df.assign(revenue = price * (1 - discount)) — per-row IEEE arithmetic
    "project_withcolumn" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy("l_orderkey", "l_linenumber")),

    // rename + drop + cast (floor-cast: double→int truncation differs
    // across engines, floor() is identical in both)
    "project_rename_drop_cast" -> ((s, d) =>
      customer(s, d)
        .withColumnRenamed("c_name", "cust_name")
        .drop("c_mktsegment")
        .withColumn("bal_floor", floor(col("c_acctbal")).cast("long"))
        .select("c_custkey", "cust_name", "c_nationkey", "bal_floor")
        .orderBy("c_custkey")),

    "filter_pred" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "A")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_isin" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    "filter_between" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate").between(
          lit("1997-01-01").cast("timestamp_ntz"),
          lit("1997-12-31").cast("timestamp_ntz")))
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")),

    // fixtures have no NULLs — inject via when(), then exercise
    // isNull / coalesce-fill / drop semantics in one aggregate
    "filter_null_handling" -> ((s, d) =>
      customer(s, d)
        .withColumn("bal2", when(col("c_acctbal") >= 0, col("c_acctbal")))
        .agg(
          count(lit(1)).as("n_all"),
          count(col("bal2")).as("n_notnull"),
          sum(when(col("bal2").isNull, 1).otherwise(0)).as("n_null"),
          dsum(coalesce(col("bal2"), lit(0.0))).as("sum_filled"))),

    // np.where / Series.where → when().otherwise()
    // dd.melt: wide → long reshape via the built-in unpivot (metadata-only
    // row explosion, no shuffle)
    "project_melt" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "k", "v")
        .orderBy("p_partkey", "k")),

    // pandas explode() keeps empty-list rows as a NaN row — Spark's
    // explode() DROPS them, so the parity form is posexplode_outer (the
    // doc survives with pos = NULL, token = NULL)
    "project_explode_outer" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => x.startsWith("s")).as("arr"))
        .select(col("doc_id"),
          posexplode_outer(col("arr")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")),

    "project_conditional" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("qclass",
          when(col("l_quantity") > 40, "H")
            .when(col("l_quantity") > 15, "M")
            .otherwise("L"))
        .groupBy("qclass").agg(count(lit(1)).as("n"))
        .orderBy("qclass"))
  )

  val oracles: Map[String, String] = Map(
    "project_select" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
    "project_withcolumn" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "project_rename_drop_cast" ->
      """SELECT c_custkey, c_name AS cust_name, c_nationkey,
        |CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_isin" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "filter_between" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |ORDER BY o_orderkey""".stripMargin,
    "filter_null_handling" ->
      s"""SELECT COUNT(*) AS n_all, COUNT(bal2) AS n_notnull,
         |CAST(SUM(CASE WHEN bal2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |${dsumSql("COALESCE(bal2, 0.0)")} AS sum_filled
         |FROM (SELECT CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS bal2
         |      FROM customer) t""".stripMargin,
    "project_melt" ->
      """SELECT p_partkey, k, v FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
        |  FROM part)
        |UNPIVOT (v FOR k IN (p_size, p_retailprice))
        |ORDER BY p_partkey, k""".stripMargin,
    "project_conditional" ->
      """SELECT CASE WHEN l_quantity > 40 THEN 'H'
        |            WHEN l_quantity > 15 THEN 'M' ELSE 'L' END AS qclass,
        |COUNT(*) AS n FROM lineitem GROUP BY qclass ORDER BY qclass""".stripMargin,
    // the [NULL] substitute list reproduces posexplode_outer's survivor
    // row; pos stays NULL for it (Spark emits NULL, not 0)
    "project_explode_outer" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, ' '),
        |      x -> starts_with(x, 's')) AS arr FROM documents),
        |u AS (SELECT doc_id, len(arr) = 0 AS empty,
        |    CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END AS arr2
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN empty THEN NULL ELSE p END AS pos, token
        |FROM (SELECT doc_id, empty,
        |    CAST(generate_subscripts(arr2, 1) - 1 AS INTEGER) AS p,
        |    unnest(arr2) AS token
        |  FROM u)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
