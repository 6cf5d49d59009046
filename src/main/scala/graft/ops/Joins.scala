package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2.C — joins.
  *
  * Reference surface: `dd.merge(how=inner/left/outer/cross)`, indicator
  * semi/anti idioms, `dd.merge_asof`, map_partitions range-join idioms.
  *
  * Strategy notes (100 TB): Catalyst's JoinSelection owns shuffle-vs-
  * broadcast (the reference picks merge strategies by heuristic; Spark's
  * planner + AQE do it from stats at runtime). We only force `broadcast()`
  * where a dimension is provably bounded (nation=25, region=5 rows at any
  * scale factor). The as-of join is the one operator Spark lacks natively:
  * implemented as union-tag + running `last(ignoreNulls)` window — a single
  * shuffle on the `by` key, O(n log n) within partitions, no O(n²) blowup,
  * safe at any scale (vs. the naive range-join + argmax which explodes).
  */
object Joins {

  /** As-of (backward) join: for each purchase, the latest prior-or-equal
    * click of the same user. One shuffle on user_id; the union-tag trick
    * turns it into a running window instead of a range join.
    */
  private def asof(s: SparkSession, d: String): DataFrame = {
    // ONE events scan: tag sides in-row instead of unioning two filtered
    // branches (a union would scan the parquet once per branch)
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        col("value"), col("event_id"))
    // dedupe clicks to ONE row per (user_id, ts) — arg-max on event_id —
    // because DuckDB's ASOF JOIN resolves equal-timestamp ties arbitrarily
    // while a window plan picks deterministically; both sides now agree by
    // construction (same rule in the oracle subquery)
    val clickW = Window.partitionBy("user_id", "ts", "side")
      .orderBy(col("event_id").desc)
    val deduped = ev
      .withColumn("__rn", row_number().over(clickW))
      .filter(col("side") === 1 || col("__rn") === 1)
    // order ties: clicks (side=0) before the purchase at the same ts so an
    // equal-timestamp click is visible (ASOF >= semantics); event_id as the
    // final total-order tie-break
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deduped
      .withColumn("click_value",
        last(when(col("side") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("click_value"))
      .orderBy("event_id")
  }

  /** Both as-of directions from ONE scan and two window passes over the
    * same user partitions (dd.merge_asof direction='forward'/'nearest').
    * Backward looks at the latest prior-or-equal click (asc order), forward
    * at the earliest later-or-equal one (desc order); equal-ts clicks stay
    * visible to both via the side tie-break. */
  private def asofDirectional(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        col("value"), col("event_id"))
    val clickW = Window.partitionBy("user_id", "ts", "side")
      .orderBy(col("event_id").desc)
    val deduped = ev
      .withColumn("__rn", row_number().over(clickW))
      .filter(col("side") === 1 || col("__rn") === 1)
    val wB = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("side").asc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickVal = when(col("side") === 0, col("value"))
    val clickTs = when(col("side") === 0, col("ts"))
    deduped
      .withColumn("bwd_value", last(clickVal, ignoreNulls = true).over(wB))
      .withColumn("bwd_ts", last(clickTs, ignoreNulls = true).over(wB))
      .withColumn("fwd_value", last(clickVal, ignoreNulls = true).over(wF))
      .withColumn("fwd_ts", last(clickTs, ignoreNulls = true).over(wF))
      .filter(col("side") === 1)
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_inner" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")),

    // left outer keeps customers with no urgent orders (count 0)
    "join_left_outer" -> ((s, d) => {
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // full outer of two disjoint per-customer aggregates; Seq-key join
    // coalesces the key column
    "join_full_outer" -> ((s, d) => {
      val o = orders(s, d)
      val f = o.filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_f"))
      val p = o.filter(col("o_orderstatus") === "P")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_p"))
      f.join(p, Seq("o_custkey"), "full").orderBy("o_custkey")
    }),

    "join_semi" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 400000)
      customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_anti" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 400000)
      customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // explicit broadcast of the bounded dims (25 / 5 rows at ANY scale)
    "join_broadcast" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("r_name", "n_name")),

    // composite-key semantics (max-price line per order) via a window max —
    // ONE lineitem scan and one shuffle instead of the agg+self-join's two
    // scans; then the chain through orders
    "join_multikey" -> ((s, d) => {
      val mx = Window.partitionBy("l_orderkey")
      lineitem(s, d)
        .withColumn("mk_price", max(col("l_extendedprice")).over(mx))
        .filter(col("l_extendedprice") === col("mk_price"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_max_price"))
        .orderBy("o_orderstatus")
    }),

    "join_cross" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // theta/range join against a bounded broadcast band table; at 100 TB
    // the band table stays tiny → broadcast nested-loop is bounded work
    "join_theta_range" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("b0", 0.0, 20000.0), ("b1", 20000.0, 40000.0),
        ("b2", 40000.0, 60000.0), ("b3", 60000.0, 1e9))
        .toDF("band", "lo", "hi")
      lineitem(s, d)
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("band")
    }),

    "join_asof" -> ((s, d) => asof(s, d)),

    // dd.merge_asof(direction='forward'): earliest later-or-equal click
    "join_asof_forward" -> ((s, d) =>
      asofDirectional(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("fwd_value").as("click_value"))
        .orderBy("event_id")),

    // dd.merge_asof(allow_exact_matches=False): strictly-before backward
    // match. Same union-tag window; the ONLY change is the tie order at
    // equal ts — purchases sort BEFORE clicks, so an equal-ts click is
    // invisible to the running last(). Completes the merge_asof knob set
    // (direction / tolerance / allow_exact_matches).
    "join_asof_strict" -> ((s, d) => {
      val ev = events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("side"),
          col("value"), col("event_id"))
      val clickW = Window.partitionBy("user_id", "ts", "side")
        .orderBy(col("event_id").desc)
      val deduped = ev
        .withColumn("__rn", row_number().over(clickW))
        .filter(col("side") === 1 || col("__rn") === 1)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deduped
        .withColumn("click_value",
          last(when(col("side") === 0, col("value")), ignoreNulls = true)
            .over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("click_value"))
        .orderBy("event_id")
    }),

    // dd.merge_asof(tolerance=...): backward match only when the latest
    // prior click is within 1 hour — matches beyond the bound become NULL
    // (pandas semantics). Same single-shuffle window plan; the tolerance is
    // a post-window predicate, not a different join.
    "join_asof_tolerance" -> ((s, d) => {
      val tolMicros = 3600L * 1000000L
      val age = unix_micros(col("ts").cast("timestamp")) -
        unix_micros(col("bwd_ts").cast("timestamp"))
      asofDirectional(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(age <= tolMicros, col("bwd_value")).as("click_value"))
        .orderBy("event_id")
    }),

    // dd.merge_asof(direction='nearest'): closer of the two, ties backward
    "join_asof_nearest" -> ((s, d) => {
      val dB = unix_micros(col("ts").cast("timestamp")) -
        unix_micros(col("bwd_ts").cast("timestamp"))
      val dF = unix_micros(col("fwd_ts").cast("timestamp")) -
        unix_micros(col("ts").cast("timestamp"))
      asofDirectional(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("bwd_ts").isNull, col("fwd_value"))
            .when(col("fwd_ts").isNull, col("bwd_value"))
            .when(dB <= dF, col("bwd_value"))
            .otherwise(col("fwd_value")).as("click_value"))
        .orderBy("event_id")
    }),

    // bucketing: both sides written bucketed+sorted on the join key, so
    // the join needs NO shuffle at read time (bucketed scan provides the
    // partitioning). At 100 TB this is THE lever for repeatedly-joined
    // fact tables: pay the shuffle once at write, never again per query.
    // PlanSpec asserts the shuffle-free plan shape.
    "join_bucketed" -> ((s, d) => {
      val pid = java.lang.ProcessHandle.current.pid
      val sf = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val loc = graft.util.Staging.dir("bucketed", d)
      // pid in the TABLE names too (not just the paths): two concurrent
      // sessions sharing a metastore must not overwrite each other's
      // table definitions (ADVICE r2)
      val ot = s"graft_orders_b_${sf}_$pid"
      val ct = s"graft_customer_b_${sf}_$pid"
      // stage once per (sf, pid): the pay-shuffle-once-at-write semantics
      // means repeat invocations (bench n=2, tests) must NOT re-pay the
      // write — they are exactly the "never again per query" reads
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(ct)) {
        // repartition by the bucket column with numPartitions = numBuckets:
        // Spark's bucket id is the same murmur3 hash mod 8, so each write
        // task holds exactly one bucket — 8 files instead of one file per
        // (task × bucket), and the sortBy sort runs once per bucket. At
        // warehouse scale this alignment is what keeps bucketed tables
        // from exploding into tasks×buckets small files.
        orders(s, d).repartition(8, col("o_custkey")).write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$loc/orders").saveAsTable(ot)
        customer(s, d).repartition(8, col("c_custkey")).write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$loc/customer").saveAsTable(ct)
      }
      s.table(ot)
        .join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // null-safe equality join (`<=>` ≡ IS NOT DISTINCT FROM): pandas
    // merge treats NaN keys as EQUAL, so this — not `===`, which drops
    // NULL keys — is the parity semantics for dask/pandas frames with
    // missing keys. NULLs are synthesized deterministically (no fixture
    // NULLs). Scale note: every NULL lands on ONE join key, so a
    // null-heavy column makes this the worst skew case — salt the null
    // group (join_salted_skew's recipe) or pre-filter if the product
    // semantics aren't wanted; the aggregate here bounds the output.
    "join_null_safe" -> ((s, d) => {
      val o = orders(s, d).select(
        when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("o_ck"),
        col("o_totalprice"))
      val c = customer(s, d).select(
        when(col("c_custkey") % 89 === 0, lit(null).cast("long"))
          .otherwise(col("c_custkey")).as("c_ck"))
      o.join(c, col("o_ck") <=> col("c_ck"))
        .groupBy(col("o_ck").isNull.as("null_key"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("null_key")
    }),

    // dynamic partition pruning: the fact table is stored hive-partitioned
    // on the join column; the dim side is small (broadcast) and carries a
    // selective predicate, so Catalyst injects the dim's key set as a
    // runtime partition filter into the fact scan — only the matching
    // directories are ever listed or read. At 100 TB this is THE lever for
    // star-schema queries over date/tenant-partitioned facts: the scan
    // cost is proportional to the dim selectivity, not the table size.
    // PlanSpec asserts the dynamicpruning expression reaches the scan.
    // Staged once per (sf, pid) like join_bucketed: partition layout is a
    // write-time property, repeat invocations measure only the pruned read.
    "join_dpp_partitioned" -> ((s, d) => {
      import s.implicits._
      val loc = graft.util.Staging.dir("dpp_orders", d)
      if (!new java.io.File(s"$loc/_SUCCESS").exists)
        orders(s, d).write.mode("overwrite")
          .partitionBy("o_orderpriority").parquet(loc)
      // the dim must be a SCAN under a Filter: an inline local relation
      // gets its predicate constant-folded away at plan time and the
      // PartitionPruning rule then sees no selective predicate to key on
      val dimLoc = graft.util.Staging.dir("dpp_dim", d)
      if (!new java.io.File(s"$dimLoc/_SUCCESS").exists)
        Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
            ("4-NOT SPECIFIED", 4), ("5-LOW", 5))
          .toDF("p_priority", "p_rank")
          .coalesce(1).write.mode("overwrite").parquet(dimLoc)
      val dim = s.read.parquet(dimLoc)
        .filter(col("p_rank") <= 2) // the selective predicate DPP keys on
      s.read.parquet(loc)
        .join(dim, col("o_orderpriority") === col("p_priority"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // interval join: events into fixed windows [start, end); the interval
    // side is bounded → broadcast; at scale, bucketize ts to an equi-key
    // first and keep the residual range predicate
    "join_interval" -> ((s, d) => {
      import s.implicits._
      val iv = Seq(
        ("w1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
        ("w2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
        ("w3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
        ("w4", "2024-01-22 00:00:00", "2024-01-29 00:00:00"))
        .toDF("iv", "start_s", "end_s")
        .select(col("iv"),
          col("start_s").cast("timestamp_ntz").as("iv_start"),
          col("end_s").cast("timestamp_ntz").as("iv_end"))
      events(s, d)
        .join(broadcast(iv), col("ts") >= col("iv_start") && col("ts") < col("iv_end"))
        .groupBy("iv")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("iv")
    }),

    // the same interval semantics WITHOUT broadcasting the interval side —
    // the scale form SCALE.md promises for when the interval table is
    // itself large (billions of maintenance windows / sessions): bucketize
    // the time axis (3-day grid), EXPLODE each interval over the buckets
    // it overlaps (bounded by interval span / bucket width), equi-join on
    // the bucket, keep the exact range as a residual predicate. The join
    // is a plain hash equi-join — shuffle volume n + Σ spans, never n×m —
    // and the result is bit-identical to join_interval (same oracle
    // modulo names). PlanSpec asserts no nested-loop/cartesian remains.
    "join_interval_bucketized" -> ((s, d) => {
      import s.implicits._
      val bucketDays = 3
      val iv = Seq(
        ("w1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
        ("w2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
        ("w3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
        ("w4", "2024-01-22 00:00:00", "2024-01-29 00:00:00"))
        .toDF("iv", "start_s", "end_s")
        .select(col("iv"),
          col("start_s").cast("timestamp_ntz").as("iv_start"),
          col("end_s").cast("timestamp_ntz").as("iv_end"))
      val epoch = lit("1970-01-01").cast("date")
      val ivB = iv.withColumn("bucket",
        explode(sequence(
          floor(datediff(to_date(col("iv_start")), epoch) / bucketDays),
          // include the end-day bucket unconditionally: for a non-day-
          // aligned exclusive end, times before it on the end day are
          // in range; for an aligned end this adds one empty candidate
          // bucket that the residual predicate filters — correctness
          // never depends on the interval's alignment
          floor(datediff(to_date(col("iv_end")), epoch) / bucketDays))))
      events(s, d)
        .withColumn("bucket",
          floor(datediff(to_date(col("ts")), epoch) / bucketDays))
        .join(ivB, Seq("bucket"))
        .filter(col("ts") >= col("iv_start") && col("ts") < col("iv_end"))
        .groupBy("iv")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("iv")
    }),

    // the JOIN-side skew lever (twin of agg_salted_skew): event_type has
    // ~5 hot keys, so a plain shuffle join would land each key on one
    // reducer. Salt the big side, replicate the small side across the salt
    // range (sequence+explode — tiny × 8), join on (key, salt): every hot
    // key spreads over 8 reducers. Same result as the plain join (the
    // oracle proves it). AQE's skew-join split is the automatic cousin;
    // salting is the deterministic form that also works mid-pipeline.
    "join_salted_skew" -> ((s, d) => {
      import s.implicits._
      val salts = 8
      val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0),
        ("signup", 5.0), ("error", 0.0))
        .toDF("event_type", "weight")
      val dimSalted = dim.select(col("event_type"), col("weight"),
        explode(sequence(lit(0), lit(salts - 1))).as("__salt"))
      events(s, d)
        .withColumn("__salt", pmod(col("event_id"), lit(salts)).cast("int"))
        .join(dimSalted, Seq("event_type", "__salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value")) * col("weight").cast("decimal(18,2)"))
            .cast("double").as("weighted_sum"))
        .orderBy("event_type")
    }),

    // pd.merge(indicator=True): full outer with a left_only / right_only /
    // both provenance column — the merge-audit idiom. Same shuffle
    // full-outer plan as join_full_outer; the indicator is a free
    // projection on the null pattern.
    "join_indicator" -> ((s, d) => {
      val l = customer(s, d).filter(col("c_nationkey") < 10)
        .select(col("c_custkey"), col("c_mktsegment"))
      val r = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_urgent"))
      l.join(r, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"), col("n_urgent"),
          when(col("c_custkey").isNull, "right_only")
            .when(col("o_custkey").isNull, "left_only")
            .otherwise("both").as("merge_ind"))
        .orderBy("custkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "join_inner" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |${dsumSql("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(f.o_custkey, p.o_custkey) AS o_custkey, f.n_f, p.n_p
        |FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_p FROM orders
        |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
        |  ON f.o_custkey = p.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "join_broadcast" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |${dsumSql("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_multikey" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |${dsumSql("l_extendedprice")} AS sum_max_price
         |FROM lineitem
         |JOIN (SELECT l_orderkey AS mk_orderkey,
         |        MAX(l_extendedprice) AS mk_price
         |      FROM lineitem GROUP BY l_orderkey) mx
         |  ON l_orderkey = mk_orderkey AND l_extendedprice = mk_price
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_asof_forward" ->
      """SELECT p.event_id, p.user_id, p.ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1) c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "join_asof_strict" ->
      """SELECT p.event_id, p.user_id, p.ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1) c
        |  ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY p.event_id""".stripMargin,
    "join_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.value END
        |  AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH cd AS (SELECT * FROM events WHERE event_type = 'click'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT p.event_id, p.user_id, p.ts,
        |    c.value AS bv, c.ts AS bt
        |  FROM p ASOF LEFT JOIN cd c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts),
        |f AS (SELECT p.event_id, c.value AS fv, c.ts AS ft
        |  FROM p ASOF LEFT JOIN cd c
        |    ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT b.event_id, b.user_id, b.ts,
        |  CASE WHEN bt IS NULL THEN fv
        |       WHEN ft IS NULL THEN bv
        |       WHEN (b.ts - bt) <= (ft - b.ts) THEN bv ELSE fv END
        |    AS click_value
        |FROM b JOIN f ON b.event_id = f.event_id
        |ORDER BY b.event_id""".stripMargin,
    "join_bucketed" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_null_safe" ->
      s"""WITH o AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
         |    ELSE o_custkey END AS o_ck, o_totalprice FROM orders),
         |c AS (SELECT CASE WHEN c_custkey % 89 = 0 THEN NULL
         |    ELSE c_custkey END AS c_ck FROM customer)
         |SELECT (o_ck IS NULL) AS null_key, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM o JOIN c ON o_ck IS NOT DISTINCT FROM c_ck
         |GROUP BY (o_ck IS NULL) ORDER BY null_key""".stripMargin,
    "join_dpp_partitioned" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_theta_range" ->
      s"""SELECT band, COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem
         |JOIN (VALUES ('b0', 0.0, 20000.0), ('b1', 20000.0, 40000.0),
         |             ('b2', 40000.0, 60000.0), ('b3', 60000.0, 1e9))
         |  AS bands(band, lo, hi)
         |  ON l_extendedprice >= lo AND l_extendedprice < hi
         |GROUP BY band ORDER BY band""".stripMargin,
    "join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "join_interval" ->
      s"""SELECT iv, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events
         |JOIN (VALUES
         |  ('w1', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08'),
         |  ('w2', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'),
         |  ('w3', TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22'),
         |  ('w4', TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29'))
         |  AS w(iv, iv_start, iv_end)
         |  ON ts >= iv_start AND ts < iv_end
         |GROUP BY iv ORDER BY iv""".stripMargin,
    "join_interval_bucketized" ->
      s"""SELECT iv, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events
         |JOIN (VALUES
         |  ('w1', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08'),
         |  ('w2', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'),
         |  ('w3', TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22'),
         |  ('w4', TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29'))
         |  AS w(iv, iv_start, iv_end)
         |  ON ts >= iv_start AND ts < iv_end
         |GROUP BY iv ORDER BY iv""".stripMargin,
    "join_salted_skew" ->
      """SELECT e.event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))
        |  * CAST(weight AS DECIMAL(18,2))) AS DOUBLE) AS weighted_sum
        |FROM events e
        |JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
        |  ('signup', 5.0), ('error', 0.0)) AS d(event_type, weight)
        |  ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "join_indicator" ->
      """SELECT COALESCE(l.c_custkey, r.o_custkey) AS custkey,
        |l.c_mktsegment, r.n_urgent,
        |CASE WHEN l.c_custkey IS NULL THEN 'right_only'
        |     WHEN r.o_custkey IS NULL THEN 'left_only'
        |     ELSE 'both' END AS merge_ind
        |FROM (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_nationkey < 10) l
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) r
        |  ON l.c_custkey = r.o_custkey
        |ORDER BY custkey""".stripMargin
  )
}
