package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** SURVEY.md §2.G — set operations.
  *
  * Reference surface: `dd.concat([a,b])`, `concat + drop_duplicates`,
  * merge-based intersect/except idioms, `df.drop_duplicates(subset=...)`.
  *
  * 100 TB notes: `unionByName` is metadata-only (no shuffle); the distinct
  * variants are one hash-shuffle on the full row — same cost shape as the
  * reference's shuffle-based drop_duplicates. `dropDuplicates(subset)` is
  * deliberately NOT used: which row survives is partitioning-dependent.
  * The deterministic form is `row_number() == 1` over an explicit
  * (keys, order) — same single shuffle, stable survivor (SURVEY §7.2.3).
  */
object SetOps {

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dd.concat: event_ids are globally unique so the union is a total order
    "set_union_all" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
      val purchases = ev.filter(col("event_type") === "purchase")
      clicks.unionByName(purchases)
        .select("event_id", "event_type", "user_id", "value")
        .orderBy("event_id")
    }),

    "set_union_distinct" -> ((s, d) => {
      val c = customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        .union(c.filter(col("c_mktsegment") === "MACHINERY")
          .select("c_nationkey"))
        .distinct()
        .orderBy("c_nationkey")
    }),

    // customers having both an F-status and an O-status order
    "set_intersect" -> ((s, d) => {
      val o = orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // customers with an order but no urgent one
    "set_except" -> ((s, d) => {
      val o = orders(s, d)
      o.select("o_custkey")
        .except(o.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // dd.random_split / df.sample spelled the way a training-data pipeline
    // actually needs it: a DETERMINISTIC hash split on a stable key, so the
    // train/val assignment is reproducible run-over-run, survives
    // repartitioning, and never needs a seed shipped around. Pure map-side
    // predicate — zero shuffle, zero state; md5 is identical across
    // engines so the oracle reproduces the exact assignment. First hex
    // char < 'd' ⇒ 13/16 ≈ 81% train.
    // pd.combine_first / dd update: overlay a sparse patch frame onto a
    // base frame — NULL holes in the base fill from the patch where a
    // matching key exists. One left equi-join + coalesce; at scale the
    // patch is usually small → AQE broadcasts it
    "set_combine_first" -> ((s, d) => {
      val c = customer(s, d)
      val base = c.select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit(null))
          .otherwise(col("c_acctbal")).as("bal"))
      val patch = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("p_key"), col("c_acctbal").as("p_bal"))
      base.join(patch, col("c_custkey") === col("p_key"), "left")
        .select(col("c_custkey"),
          coalesce(col("bal"), col("p_bal")).as("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "sample_hash_split" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1) < "d",
            "train").otherwise("val").as("split"))
        .orderBy("doc_id")),

    // df.sample(n=...): EXACT-n pseudo-random sample — order by a content
    // hash, take n. Deterministic (reproducible run-over-run, no seed to
    // ship), engine-identical, and the plan is top-k (TakeOrderedAndProject)
    // not a global sort. The frac-based cousin is sample_hash_split.
    "sample_exact_n" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("__h"))
        .orderBy(col("__h"))
        .limit(100)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    // drop_duplicates(subset=[user,type], keep='first' by time) — spelled as
    // row_number()==1 so the survivor is deterministic
    "dedup_drop_duplicates" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    }),

    // keep='last': identical single-shuffle plan, inverted survivor order
    "dedup_keep_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT event_id, event_type, user_id, value FROM events
        |WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, user_id, value FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY c_nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,
    "set_combine_first" ->
      """SELECT b.c_custkey,
        |COALESCE(b.bal, p.p_bal) AS c_acctbal
        |FROM (SELECT c_custkey,
        |        CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END
        |          AS bal FROM customer) b
        |LEFT JOIN (SELECT c_custkey AS p_key, c_acctbal AS p_bal
        |        FROM customer WHERE c_custkey % 5 = 0) p
        |  ON b.c_custkey = p.p_key
        |ORDER BY b.c_custkey""".stripMargin,
    "sample_hash_split" ->
      """SELECT doc_id,
        |CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
        |  THEN 'train' ELSE 'val' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_drop_duplicates" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "sample_exact_n" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100) t
        |ORDER BY doc_id""".stripMargin,
    "dedup_keep_last" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
  )
}
