package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2.D — aggregations.
  *
  * Reference surface: `df.groupby(k).agg({...})`, `nunique`,
  * `nunique_approx` (HLL), `value_counts`, `quantile`, `dd.Aggregation`
  * (custom chunk/agg/finalize triple), `pivot_table`, `describe`.
  *
  * dask's chunk/agg/finalize maps 1:1 onto Spark's partial/merge/final
  * HashAggregate — map-side combine is automatic. `dd.Aggregation` maps to
  * `Aggregator[IN,BUF,OUT]` (the custom UDAF below keeps an exact integer
  * buffer so the result is associative and hash-stable).
  *
  * 100 TB notes: every aggregate here is a single shuffle with partial
  * aggregation; `pivot` always gets an explicit value list (no driver-side
  * collect of the pivot domain); exact percentile is the one op that
  * gathers a group's values — at scale swap to approx_percentile; skewed
  * keys are AQE's problem for joins and salting's for aggs.
  */
object Aggregations {

  /** Custom UDAF (dd.Aggregation equivalent): exact sum of squared
    * quantity-cents. Integer buffer → associative, order-insensitive,
    * bit-stable across engines (unlike a double accumulator).
    */
  object SumSqCents extends Aggregator[Double, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, q: Double): Long = {
      val c = math.round(q * 100); b + c * c
    }
    def merge(a: Long, b: Long): Long = a + b
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  def sumsq_cents(c: Column): Column = udaf(SumSqCents).apply(c)

  private val pivotTypes = Seq("click", "error", "purchase", "signup", "view")

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_global" -> ((s, d) =>
      lineitem(s, d).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    // TPC-H Q1 shape — the flagship (SparkEntry.entry reuses it).
    // Derived money stays in DECIMAL arithmetic end to end (§7.2.2).
    "agg_groupby_basic" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_groupby_multikey" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus", "ship_year")),

    "agg_count_distinct" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // HLL++ sketch — declared without oracle (estimates are engine-specific)
    "agg_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"))),

    "agg_value_counts" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"))),

    // exact interpolated percentiles (≡ DuckDB quantile_cont); rounded 6dp
    // because the interpolation arithmetic is genuinely double.
    // SORT-BASED distributed plan (r6 — closes the carried `weak`):
    // per-(group, value) counts → running-rank window (the sort is the
    // shuffle's, spilling to disk) → rank-interval lookup + the same
    // lower + frac·(upper − lower) arithmetic at pos = p·(n−1) that
    // Spark's percentile() and DuckDB's quantile_cont run. The
    // percentile() TypedImperativeAggregate it replaces buffers EVERY
    // group value in one in-memory aggregation buffer — correct, but
    // the one memory-unbounded aggregate at 100 TB; this plan's
    // per-task state is a running sum.
    "agg_median_quantile" -> ((s, d) => {
      val vals = orders(s, d)
        .select(col("o_orderstatus").as("g"),
          col("o_totalprice").cast("double").as("v"))
        // quantile_cont/percentile() ignore NULL metrics — without this
        // filter a NULL group would join the rank intervals (NULLS
        // FIRST) and shift every position (o_totalprice is NOT NULL in
        // the fixture; the filter keeps the recipe reusable)
        .filter(col("v").isNotNull)
        .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vals.withColumn("ck", sum(col("cnt")).over(w))
      val n = vals.groupBy("g").agg(sum(col("cnt")).as("n"))
      // a value row covers 0-based ranks [ck − cnt, ck − 1]; the row
      // covering floor/ceil(pos) supplies the interpolation endpoints
      def at(rank: Column) =
        max(when(col("ck") - col("cnt") <= rank &&
          col("ck") - 1 >= rank, col("v")))
      val j = cum.join(broadcast(n), "g")
        .withColumn("pos50", (col("n") - 1) * 0.5)
        .withColumn("pos90", (col("n") - 1) * 0.9)
      j.groupBy("g")
        .agg(
          at(floor(col("pos50"))).as("lo50"), at(ceil(col("pos50"))).as("hi50"),
          at(floor(col("pos90"))).as("lo90"), at(ceil(col("pos90"))).as("hi90"),
          max(col("pos50")).as("p50"), max(col("pos90")).as("p90"))
        .select(col("g").as("o_orderstatus"),
          round(col("lo50") + (col("p50") - floor(col("p50"))) *
            (col("hi50") - col("lo50")), 6).as("median_price"),
          round(col("lo90") + (col("p90") - floor(col("p90"))) *
            (col("hi90") - col("lo90")), 6).as("p90_price"))
        .orderBy("o_orderstatus")
    }),

    // the 100 TB twin of agg_median_quantile: approx_percentile buffers a
    // bounded sketch per group instead of every value (exact percentile is
    // a TypedImperativeAggregate that gathers the whole group — correct,
    // but memory-unbounded at scale). No oracle: sketch estimates are
    // engine-specific; a unit test bounds the error vs exact.
    "agg_quantile_approx" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("median_est"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(1000))
            .as("p90_est"))
        .orderBy("o_orderstatus")),

    // salting demo: pre-aggregate on (key, salt) to spread a skewed key
    // across partitions, then merge partials — same result as a plain
    // groupBy (the oracle proves it), two balanced shuffles instead of one
    // skewed one. The technique every 100 TB groupBy over a hot key needs.
    "agg_salted_skew" -> ((s, d) => {
      val salted = events(s, d)
        .withColumn("__salt", col("event_id") % 16)
        .groupBy("event_type", "__salt")
        .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
      salted.groupBy("event_type")
        .agg(sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // Pearson correlation from EXACT decimal moments (dd.corr): the five
    // sums are order-free decimals; the r formula then runs in IEEE double
    // spelled identically in the oracle — corr(double) built-ins would be
    // addition-order nondeterministic (SURVEY §7.2.2)
    "agg_corr" -> ((s, d) => {
      val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sx2"),
          sum(y * y).cast("double").as("sy2"))
        .select(col("l_returnflag"),
          r6((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("n") * col("sy2") - col("sy") * col("sy"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // POPULATION skewness / excess kurtosis (3rd/4th standardized
    // moments) from EXACT integer power sums (l_quantity is integer-
    // valued; powers cast to DECIMAL(38,0) so the sums stay exact at any
    // row count), finished in IEEE double spelled identically in the
    // oracle. NOTE: pandas .skew()/.kurt() additionally apply the
    // G1/G2 sample-bias corrections — an O(1/n) constant-factor
    // post-step on these same moments, not computed here. The
    // denominator uses va·sqrt(va) — not pow(va, 1.5) — because sqrt is
    // correctly rounded in both engines while pow is libm-dependent.
    "agg_skew_kurt" -> ((s, d) => {
      val q = col("l_quantity").cast("long")
      def qd(e: Column): Column = sum(e.cast(DecimalType(38, 0)))
        .cast("double")
      val n = col("n"); val m1 = col("s1") / n; val m2 = col("s2") / n
      val m3 = col("s3") / n; val m4 = col("s4") / n
      val va = m2 - m1 * m1
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          qd(q).as("s1"), qd(q * q).as("s2"),
          qd(q * q * q).as("s3"), qd(q * q * q * q).as("s4"))
        .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          r6((m3 - lit(3) * m1 * m2 + lit(2) * m1 * m1 * m1) /
            (va * sqrt(va))).as("skew"),
          r6((m4 - lit(4) * m1 * m3 + lit(6) * m1 * m1 * m2 -
            lit(3) * m1 * m1 * m1 * m1) / (va * va) - lit(3)).as("kurt"))
        .orderBy("l_returnflag")
    }),

    // boolean aggregates (pandas .all()/.any() + count of a predicate):
    // partial-aggregated AND/OR/conditional-count in one pass
    "agg_bool" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(bool_and(col("value") > 100).as("all_gt100"),
          bool_or(col("value") > 900).as("any_gt900"),
          count_if(col("value") > 500).as("n_gt500"))
        .orderBy("event_type")),

    // weighted mean (np.average(weights=...)): exact decimal numerator and
    // denominator, one IEEE divide at the end — same recipe as davg
    "agg_weighted_avg" -> ((s, d) => {
      val q = dec(col("l_quantity")); val p = dec(col("l_extendedprice"))
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg((sum(q * p).cast("double") / sum(q).cast("double"))
          .as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // mode (pandas .mode per group): most frequent event_type per user —
    // count + deterministic rank (ties break to the smaller value), one
    // extra exchange over the (user, type) partial-agg
    "agg_mode" -> ((s, d) => {
      val counts = events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy("user_id")
    }),

    // idxmax (dd.idxmax / argmax): the row identity at each group's max.
    // max(struct(value, id)) is a single partial-aggregated pass with a
    // TOTAL order (value ties break on id), unlike max_by whose ties are
    // nondeterministic — SURVEY §7.2's determinism rule applied to argmax
    "agg_argmax" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(max(struct(col("value"), col("event_id"))).as("m"))
        .select(col("event_type"),
          col("m.value").as("max_value"),
          col("m.event_id").as("argmax_id"))
        .orderBy("event_type")),

    // sample covariance (dd.cov) from the same exact-decimal moments as
    // agg_corr: the covar_samp(double) built-in is addition-order
    // nondeterministic; (sxy - sx·sy/n)/(n-1) over exact sums is not
    "agg_cov" -> ((s, d) => {
      val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          r6((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("n") - 1)).as("cov_qty_price"))
        .orderBy("l_returnflag")
    }),

    "agg_custom_udaf" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sumsq_cents(col("l_quantity")).as("sumsq"))
        .orderBy("l_returnflag")),

    // pivot with an EXPLICIT value list: deterministic column order and no
    // collect of the domain (100 TB rule)
    "agg_pivot" -> ((s, d) => {
      val p = events(s, d)
        .withColumn("bucket", col("user_id") % 10)
        .groupBy("bucket")
        .pivot("event_type", pivotTypes)
        .agg(count(lit(1)))
      pivotTypes.foldLeft(p)((df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy("bucket")
    }),

    "agg_rollup" -> ((s, d) =>
      customer(s, d)
        .rollup("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("c_nationkey").asc_nulls_first)),

    "agg_cube" -> ((s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    "agg_grouping_sets" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM graft_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // describe-style summary via explicit fns (std omitted: double-order
    // nondeterminism — see prep_standard_scale for the exact-moments way)
    "agg_describe" -> ((s, d) =>
      lineitem(s, d).agg(
        count(col("l_quantity")).as("qty_count"),
        davg(col("l_quantity")).as("qty_mean"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        davg(col("l_extendedprice")).as("price_mean"),
        min(col("l_extendedprice")).as("price_min"),
        max(col("l_extendedprice")).as("price_max"))),

    // Pairwise correlation MATRIX (DataFrame.corr() over all numeric
    // columns — the pandas/dask profiling staple), long-form output.
    // ONE scan, ONE partial-agg pass computes every per-column sum,
    // square sum, and cross-product as an exact order-free decimal
    // (k + k(k+1)/2 aggregates for k columns — still a single global
    // HashAggregate row); `inline` then fans the 1-row moment vector out
    // to one row per pair with the Pearson r finished in IEEE double,
    // spelled identically in the oracle. At 100 TB this is the same cost
    // as one agg_global — no per-pair passes, no shuffle beyond the
    // 1-row aggregate.
    "agg_corr_matrix" -> ((s, d) => {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val prs = for { i <- cs.indices; j <- (i + 1) until cs.size }
        yield (cs(i), cs(j))
      val moments =
        Seq(count(lit(1)).cast("double").as("n")) ++
          cs.map(c => sum(dec(col(c))).cast("double").as(s"s_$c")) ++
          cs.map(c =>
            sum(dec(col(c)) * dec(col(c))).cast("double").as(s"q_$c")) ++
          prs.map { case (a, b) =>
            sum(dec(col(a)) * dec(col(b))).cast("double").as(s"p_${a}_$b") }
      def rOf(a: String, b: String): Column =
        r6((col("n") * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
          (sqrt(col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")) *
            sqrt(col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b"))))
      lineitem(s, d)
        .agg(moments.head, moments.tail: _*)
        .select(inline(array(prs.map { case (a, b) =>
          struct(lit(a).as("col_a"), lit(b).as("col_b"),
            rOf(a, b).as("corr_r")) }: _*)))
        .orderBy("col_a", "col_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_global" ->
      s"""SELECT ${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n,
         |MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
         |FROM lineitem""".stripMargin,
    "agg_groupby_basic" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |${davgSql("l_quantity")} AS avg_qty,
         |${davgSql("l_extendedprice")} AS avg_price,
         |COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_groupby_multikey" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(year(l_shipdate) AS INTEGER) AS ship_year, COUNT(*) AS n,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1, 2, 3
         |ORDER BY l_returnflag, l_linestatus, ship_year""".stripMargin,
    "agg_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |COUNT(*) AS n_events FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_value_counts" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,
    "agg_median_quantile" ->
      """SELECT o_orderstatus,
        |ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
        |ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_corr" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((n * sxy - sx * sy) /
        |    (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
        |  AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_salted_skew" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |${dsumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_skew_kurt" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
        |    AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
        |    AS DOUBLE) AS s2,
        |  CAST(SUM(CAST(CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
        |    AS DOUBLE) AS s3,
        |  CAST(SUM(CAST(CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
        |    AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  ROUND((s3/n - 3 * (s1/n) * (s2/n)
        |      + 2 * (s1/n) * (s1/n) * (s1/n))
        |    / ((s2/n - (s1/n) * (s1/n))
        |      * sqrt(s2/n - (s1/n) * (s1/n))), 6) AS skew,
        |  ROUND((s4/n - 4 * (s1/n) * (s3/n)
        |      + 6 * (s1/n) * (s1/n) * (s2/n)
        |      - 3 * (s1/n) * (s1/n) * (s1/n) * (s1/n))
        |    / ((s2/n - (s1/n) * (s1/n)) * (s2/n - (s1/n) * (s1/n)))
        |    - 3, 6) AS kurt
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_bool" ->
      """SELECT event_type,
        |bool_and(value > 100) AS all_gt100,
        |bool_or(value > 900) AS any_gt900,
        |CAST(COUNT(CASE WHEN value > 500 THEN 1 END) AS BIGINT) AS n_gt500
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |/ CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |  AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """SELECT user_id, event_type AS mode_type, n FROM (
        |  SELECT user_id, event_type, COUNT(*) AS n FROM events
        |  GROUP BY user_id, event_type) t
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |  ORDER BY n DESC, event_type ASC) = 1
        |ORDER BY user_id""".stripMargin,
    "agg_argmax" ->
      """SELECT event_type, value AS max_value, event_id AS argmax_id
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |  ORDER BY value DESC, event_id DESC) = 1
        |ORDER BY event_type""".stripMargin,
    "agg_cov" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((sxy - sx * sy / n) / (n - 1), 6) AS cov_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_custom_udaf" ->
      """SELECT l_returnflag,
        |CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) *
        |         CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sumsq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |CAST(COUNT(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) AS click,
        |CAST(COUNT(CASE WHEN event_type='error' THEN 1 END) AS BIGINT) AS error,
        |CAST(COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT) AS purchase,
        |CAST(COUNT(CASE WHEN event_type='signup' THEN 1 END) AS BIGINT) AS signup,
        |CAST(COUNT(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "agg_rollup" ->
      s"""SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
         |${dsumSql("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
         |ORDER BY c_mktsegment ASC NULLS FIRST,
         |         c_nationkey ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_describe" ->
      s"""SELECT COUNT(l_quantity) AS qty_count,
         |${davgSql("l_quantity")} AS qty_mean,
         |MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
         |${davgSql("l_extendedprice")} AS price_mean,
         |MIN(l_extendedprice) AS price_min, MAX(l_extendedprice) AS price_max
         |FROM lineitem""".stripMargin,
    "agg_corr_matrix" -> {
      // generated from the SAME column list as the Spark side so the two
      // can't drift; exact decimal moments, r finished in double
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val prs = for { i <- cs.indices; j <- (i + 1) until cs.size }
        yield (cs(i), cs(j))
      val moments =
        Seq("CAST(COUNT(*) AS DOUBLE) AS n") ++
          cs.map(c => s"CAST(SUM(${decSql(c)}) AS DOUBLE) AS s_$c") ++
          cs.map(c =>
            s"CAST(SUM(${decSql(c)} * ${decSql(c)}) AS DOUBLE) AS q_$c") ++
          prs.map { case (a, b) =>
            s"CAST(SUM(${decSql(a)} * ${decSql(b)}) AS DOUBLE) AS p_${a}_$b" }
      val rows = prs.map { case (a, b) =>
        s"SELECT '$a' AS col_a, '$b' AS col_b, " +
          s"ROUND((n * p_${a}_$b - s_$a * s_$b) / " +
          s"(sqrt(n * q_$a - s_$a * s_$a) * " +
          s"sqrt(n * q_$b - s_$b * s_$b)), 6) AS corr_r FROM m" }
      s"WITH m AS (SELECT ${moments.mkString(", ")} FROM lineitem) " +
        rows.mkString(" UNION ALL ") + " ORDER BY col_a, col_b"
    }
  )
}
