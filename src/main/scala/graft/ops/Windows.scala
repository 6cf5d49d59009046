package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2.E — window functions.
  *
  * Reference surface: pandas/dask `groupby.cumcount()`, `groupby.rank()`,
  * `groupby.shift()/diff()`, `groupby.cumsum()`, `rolling(n)`,
  * `rolling('7D')`, `groupby.first()/last()`.
  *
  * All map onto built-in Spark window expressions — a single shuffle on the
  * partition key, sort within partitions, streaming frame evaluation. That
  * is exactly the 100 TB-safe plan: no per-group materialization beyond the
  * frame, no driver involvement, and skew is bounded by the largest single
  * key (users/customers here, which are naturally fine-grained).
  *
  * Determinism rules (SURVEY §7.2):
  *  - every window ORDER BY is a total order (unique key as tie-break) —
  *    ntile/lag/lead/row_number are position-dependent and would otherwise
  *    be nondeterministic under ties;
  *  - running/rolling money sums use DECIMAL accumulation (order-free),
  *    emitted as DOUBLE; rolling averages divide the exact decimal sum by
  *    the frame count in IEEE double — bit-stable in both engines;
  *  - percent_rank is a genuinely-double ratio → rounded 6 dp both sides.
  */
object Windows {

  /** orders windowed per customer, ordered by (date, key) — a total order. */
  private def perCust = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  /** (1-α)^i weights for the truncated EWM, α = 0.2, 10 lags — the ONE
    * definition both the Spark plan and the DuckDB oracle consume. */
  private val ewmWeights: Seq[Double] = (0 until 10).map(math.pow(0.8, _))

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // groupby.cumcount(): per-customer ordinal of orders by date
    "window_row_number" -> ((s, d) =>
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(perCust).as("rn"))
        .orderBy("o_custkey", "rn")),

    // groupby.rank(method='min'/'dense'): ties share a rank, so the window
    // order deliberately uses ONLY the value column (equal prices ⇒ equal
    // rank in both engines); row identity comes back in the output sort
    "window_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // rank(pct=True) + qcut(4): percent_rank is double → round 6dp; ntile
    // is position-based → total-order window (price, key)
    "window_percent_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          r6(percent_rank().over(w)).as("pct_rank"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderstatus", "o_orderkey")
    }),

    // empirical CDF position INCLUDING the current row (pandas
    // rank(pct=True)): cume_dist = rows ≤ current / partition rows —
    // integer arithmetic finished by one IEEE divide, tie groups share a
    // value in both engines. Completes the ranking family
    // (row_number/rank/dense/percent_rank/ntile/cume_dist).
    "window_cume_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          cume_dist().over(w).as("cdist"))
        .orderBy("o_orderstatus", "o_orderkey")
    }),

    // groupby.shift(1) / shift(-1): previous & next event value per user
    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("event_id")
    }),

    // groupby.cumsum(): running money total per user — DECIMAL accumulation
    // (order-free within the frame), emitted as DOUBLE
    "window_cumsum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          sum(dec(col("value"))).over(w).cast("double").as("run_total"))
        .orderBy("event_id")
    }),

    // rolling(3).mean(): trailing-3-rows mean = exact decimal frame sum
    // (double) / frame count (IEEE divide — bit-stable both engines)
    "window_rolling_rows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          (sum(dec(col("value"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("rolling_mean3"))
        .orderBy("event_id")
    }),

    // rolling(3).min()/max(): order statistics are exact on doubles — no
    // decimal detour needed; same streaming frame as the rolling mean
    "window_rolling_minmax" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          min(col("value")).over(w).as("rolling_min3"),
          max(col("value")).over(w).as("rolling_max3"))
        .orderBy("event_id")
    }),

    // rolling(5).median(): exact percentile over a small rows frame.
    // Frame values are integer-valued quantities, so the 0.5-interpolation
    // (midpoint of two integers) is exact in IEEE double in any engine —
    // the exactness argument that does NOT hold for arbitrary doubles
    // (where interpolation formula order could differ); a production
    // rolling quantile over continuous values would round or use the
    // approx sketch. Frame cost is O(k log k) per row with k=5, streaming.
    "window_rolling_quantile" -> ((s, d) => {
      // fixture lineitem has no unique key (see window_rolling_corr): the
      // frame order ends in l_quantity itself, so any residual tie swaps
      // rows with EQUAL quantity — the frame multiset, hence the median,
      // is deterministic either way
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
        .rowsBetween(-4, Window.currentRow)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          percentile(col("l_quantity"), lit(0.5)).over(w).as("roll_med5"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "roll_med5")
    }),

    // rolling(3).std(): exact-decimal moments (sum, sum-of-squares are
    // DECIMAL — order-free) finished in IEEE double: the StandardScaler
    // recipe (Pipeline.scala) applied to a window frame. greatest(…, 0)
    // absorbs the −ε a constant frame can leave in double; n=1 frames are
    // NULL (sample std undefined), same rule both engines.
    "window_rolling_std" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      val sm = sum(dec(col("value"))).over(w).cast("double")
      val sq = sum(dec(col("value")) * dec(col("value"))).over(w)
        .cast("double")
      val n = count(lit(1)).over(w).cast("double")
      events(s, d)
        .select(col("event_id"), col("user_id"),
          when(n > 1,
            round(sqrt(greatest((sq - sm * sm / n) / (n - 1), lit(0.0))), 6))
            .as("rolling_std3"))
        .orderBy("event_id")
    }),

    // pandas rolling(5).skew()/.kurt() parity: BIAS-CORRECTED sample
    // statistics (G1 = g1·√(n(n−1))/(n−2); G2 = ((n+1)·g2 + 6)·(n−1)/
    // ((n−2)(n−3))) with partial frames NULL — pandas' min_periods =
    // window — plus NULL on zero variance, gated on identical double
    // compares in both engines. Values become integer CENTS (skew/kurt
    // are scale-invariant, so cents ≡ dollars) and the power sums run
    // EXACTLY in wide integer arithmetic — DECIMAL(38,0) here, HUGEINT
    // in the oracle — so the sums are order-free (§7.2.2) and the
    // overflow envelope is ~1e38, not long's 9.2e18 (a plain long c⁴
    // wraps silently past |value| ≈ 551); only the final formula runs
    // in double.
    "window_rolling_skew" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      val cd = round(col("value") * 100).cast("long")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      def qd(e: org.apache.spark.sql.Column) = sum(e).over(w).cast("double")
      val n = count(lit(1)).over(w).cast("double")
      val m1 = col("s1") / col("n"); val m2 = col("s2") / col("n")
      val m3 = col("s3") / col("n"); val m4 = col("s4") / col("n")
      val va = m2 - m1 * m1
      val g1 = (m3 - lit(3) * m1 * m2 + lit(2) * m1 * m1 * m1) /
        (va * sqrt(va))
      val g2 = (m4 - lit(4) * m1 * m3 + lit(6) * m1 * m1 * m2 -
        lit(3) * m1 * m1 * m1 * m1) / (va * va) - lit(3)
      events(s, d)
        .select(col("event_id"), col("user_id"), n.as("n"),
          qd(cd).as("s1"), qd(cd * cd).as("s2"), qd(cd * cd * cd).as("s3"),
          qd(cd * cd * cd * cd).as("s4"))
        .select(col("event_id"), col("user_id"),
          when(col("n") >= 5 && va > 0,
            r6(g1 * sqrt(col("n") * (col("n") - 1)) / (col("n") - 2)))
            .as("skew5"),
          when(col("n") >= 5 && va > 0,
            r6(((col("n") + 1) * g2 + lit(6)) * (col("n") - 1) /
              ((col("n") - 2) * (col("n") - 3)))).as("kurt5"))
        .orderBy("event_id")
    }),

    // pandas groupby().transform('mean'): the per-group statistic
    // broadcast back onto every member row — an unbounded-frame window
    // (ONE shuffle on the group key, no join back). The mean is an exact
    // decimal sum IEEE-divided by the count: bit-stable, no rounding.
    "window_group_transform" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"),
          (sum(dec(col("l_extendedprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("order_mean_price"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // pandas rolling(10).corr(other): windowed Pearson correlation from
    // exact decimal power/cross sums (the agg_corr recipe over a moving
    // frame). Emitted only for FULL windows with nonzero variance on both
    // sides — the guard compares exact values, so the NULL set is
    // engine-identical.
    "window_rolling_corr" -> ((s, d) => {
      // (orderkey, linenumber) is NOT unique in the fixture lineitem;
      // partkey completes the unique tie-break so the rolling frame's
      // contents — and therefore the correlation — are deterministic
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
        .rowsBetween(-9, Window.currentRow)
      val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
      val n = count(lit(1)).over(w).cast("double")
      val sx = sum(x).over(w).cast("double")
      val sy = sum(y).over(w).cast("double")
      val sxy = sum(x * y).over(w).cast("double")
      val sx2 = sum(x * x).over(w).cast("double")
      val sy2 = sum(y * y).over(w).cast("double")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          when(n === 10 && (n * sx2 - sx * sx) > 0 &&
              (n * sy2 - sy * sy) > 0,
            round((n * sxy - sx * sy) /
              (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6))
            .as("rolling_corr10"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // pandas ewm(alpha=0.2).mean() in its scale-bounded form: a 10-lag
    // truncated exponential weighting ((1-α)^10 ≈ 0.107 tail mass
    // dropped) — the untruncated recursive form needs unbounded history
    // per row, which no shuffle-parallel engine should buy. Weight
    // constants come from ONE Scala computation and feed both engines
    // (lit() here, shortest-repr text in the oracle). The engines'
    // internal summation still differs by an ulp on long chains, so the
    // result goes through the standard r6 convention (like percent_rank).
    "window_ewm_mean" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val num = ewmWeights.zipWithIndex.map { case (wi, i) =>
        coalesce(lag(col("value"), i).over(w) * lit(wi), lit(0.0))
      }.reduce(_ + _)
      val den = ewmWeights.zipWithIndex.map { case (wi, i) =>
        when(lag(col("value"), i).over(w).isNotNull, lit(wi))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
      events(s, d)
        .select(col("event_id"), col("user_id"), r6(num / den).as("ewm_mean"))
        .orderBy("event_id")
    }),

    // groupby.cummax()/cummin()/diff(): running extrema + first difference.
    // cummax/cummin are exact order statistics on doubles; diff is a single
    // IEEE subtraction — bit-identical both engines, no rounding needed
    "window_cum_extrema" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          max(col("value")).over(run).as("cummax"),
          min(col("value")).over(run).as("cummin"),
          (col("value") - lag(col("value"), 1).over(ord)).as("diff"))
        .orderBy("event_id")
    }),

    // rolling('7D').sum(): trailing-7-day money per customer. RANGE frame
    // over epoch seconds (integer — identical on both engines); ties on the
    // same date all fall inside the frame, so no tie-break is needed for
    // the frame itself, only for the output order
    "window_rolling_time" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
        .rangeBetween(-7L * 86400, 0)
      orders(s, d)
        // NTZ → long needs the LTZ hop; identity under the pinned-UTC session
        .withColumn("epoch_s", col("o_orderdate").cast("timestamp").cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("sum_7d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // pandas pct_change: relative step vs the previous row per group —
    // (x − lag)/lag in one window pass; first row per group is NULL like
    // pandas. Identical IEEE subtract/divide both engines, rounded 6 dp.
    "window_pct_change" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round((col("o_totalprice") - lag(col("o_totalprice"), 1).over(w))
            / lag(col("o_totalprice"), 1).over(w), 6).as("pct_change"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // batch sessionization (the gap-based session labeling every
    // clickstream pipeline runs; the batch twin of stream_session):
    // new-session flag = gap to the previous event > 30 min, session
    // index = running sum of flags — lag + cumsum in ONE per-user window
    // pass, no self-join. Gaps compare in integer MICROSECONDS
    // (epoch_us / unix_micros both engines — never fractional-second
    // doubles). At 100 TB this shuffles once on user_id and streams each
    // partition; the session key then bounds any downstream per-session
    // aggregate.
    "window_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        // NTZ → long needs the LTZ hop; identity under the pinned-UTC
        // session
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull
            || col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L,
            1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(run))
        .select(col("event_id"), col("user_id"), col("session_idx"))
        .orderBy("event_id")
    }),

    // groupby.first()/last() with an explicit full-partition frame
    "window_first_last" -> ((s, d) => {
      val w = perCust.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // groupby.nth(1): the second order's price per customer (NULL for
    // single-order customers) — nth_value over the full-partition frame
    "window_nth_value" -> ((s, d) => {
      val w = perCust.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ------------------------------------------------------------------
    // GLOBAL-order windows (r10) — dask's map_overlap territory. A naive
    // Window.orderBy with no partition key funnels the whole corpus
    // through ONE task; these three run through graft.api.Overlap's
    // bucket+halo engine instead (value-range buckets merged to ≥frame
    // rows, boundary rows replicated into the neighbor group, window
    // partitioned BY GROUP), which is bit-identical to the naive plan
    // (asserted in ApiSpec) with every exchange bucket-parallel.
    // ------------------------------------------------------------------

    // map_overlap(rolling(5, center=True).mean()): centered 5-row mean
    // over the GLOBAL (ts, event_id) order — exact decimal frame sum /
    // frame count, same determinism rules as window_rolling_rows
    "window_rolling_global" -> ((s, d) =>
      graft.api.Overlap.rollingRows(
          events(s, d).select(col("event_id"), col("ts"), col("value")),
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), before = 2, after = 2)(w0 => {
        val w = w0.rowsBetween(-2, 2)
        Seq((sum(dec(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w)).as("rolling_mean5c"))
      })
        .select(col("event_id"), col("rolling_mean5c"))
        .orderBy("event_id")),

    // map_overlap(shift(±1)) / diff(): global lag/lead spelled as
    // first_value over the [-1,-1] / [1,1] rows frame (lag/lead reject
    // explicit frames, and the one-row frame is exactly the halo width);
    // diff stays in exact decimal before the double cast
    "window_lag_global" -> ((s, d) =>
      graft.api.Overlap.rollingRows(
          events(s, d).select(col("event_id"), col("ts"), col("value")),
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), before = 1, after = 1)(w0 =>
        Seq(
          first(col("value")).over(w0.rowsBetween(-1, -1)).as("prev_value"),
          first(col("value")).over(w0.rowsBetween(1, 1)).as("next_value"),
          (dec(col("value")) -
            first(dec(col("value"))).over(w0.rowsBetween(-1, -1)))
            .cast("double").as("diff_value")))
        .select(col("event_id"), col("prev_value"), col("next_value"),
          col("diff_value"))
        .orderBy("event_id")),

    // map_overlap(rolling('24h').sum()): trailing-24-hour sum over the
    // GLOBAL time order — the RANGE-frame halo form: group value spans
    // are forced ≥ the range width, so halo membership is a pure value
    // predicate (no counts, no ranks) and every frame completes through
    // one neighbor; exact decimal sum, micros key both engines
    "window_rolling_time_global" -> ((s, d) =>
      graft.api.Overlap.rollingRange(
          events(s, d).select(col("event_id"), col("ts"), col("value")),
          unix_micros(col("ts").cast("timestamp")),
          rangeBefore = 86400000000L, rangeAfter = 0L)(w =>
        Seq(sum(dec(col("value"))).over(w).cast("double").as("sum_24h")))
        .select(col("event_id"), col("sum_24h"))
        .orderBy("event_id")),

    // reset_index-style GLOBAL ordinal: a corpus-wide row_number as the
    // running count of ones through the same two-phase prefix sum — the
    // stable-sequential-id assignment a 100 TB corpus cannot get from a
    // single-partition ROW_NUMBER window
    "window_row_number_global" -> ((s, d) =>
      graft.api.Overlap.runningSum(
          events(s, d).select(col("event_id"), col("ts")),
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), lit(1L), "rn")
        .select(col("event_id"), col("rn").cast("bigint").as("rn"))
        .orderBy("event_id")),

    // cumsum() over the global order — the two-phase prefix sum: exact
    // within-group running decimal totals plus broadcast group offsets;
    // the only un-partitioned window runs over the ≤64-row TOTALS frame
    "window_cumsum_global" -> ((s, d) =>
      graft.api.Overlap.runningSum(
          events(s, d).select(col("event_id"), col("ts"), col("value")),
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), dec(col("value")), "run_total")
        .select(col("event_id"), col("run_total").cast("double")
          .as("run_total"))
        .orderBy("event_id")),

    // GLOBAL dense_rank (r11) — the ranking form where ties are the
    // point: each event's DAY index in the corpus-wide day order,
    // within-group dense_rank + distinct-count prefix offsets over the
    // ≤64-row TOTALS frame (Overlap.denseRank scaladoc)
    "window_dense_rank_global" -> ((s, d) => {
      val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
      graft.api.Overlap.denseRank(
          events(s, d).select(col("event_id"), col("ts"))
            .withColumn("__day", day),
          col("__day"), Seq(col("__day")), "day_rank")
        .select(col("event_id"), col("day_rank"))
        .orderBy("event_id")
    }),

    // GLOBAL ntile (r11) — 7 balanced corpus-order tiles: two-phase
    // global row_number + the SQL fill rule in exact integer arithmetic
    // (Overlap.ntile); no single-partition window at any size
    "window_ntile_global" -> ((s, d) =>
      graft.api.Overlap.ntile(
          events(s, d).select(col("event_id"), col("ts")),
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), n = 7, "tile7")
        .select(col("event_id"), col("tile7"))
        .orderBy("event_id")),

    // GLOBAL sessionization (r11) — gaps-and-islands over the WHOLE
    // corpus order (no user key to partition by: the shape of
    // click-stream boundary detection, shard cutting, outage
    // segmentation). Two Overlap engines COMPOSED: the halo'd lag
    // (rollingRows, before=1) flags >30-min gaps, and the two-phase
    // prefix sum (runningSum) turns flags into session ids — no
    // single-partition window anywhere near the data, at any size.
    "window_sessionize_global" -> ((s, d) => {
      val evs = events(s, d)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .select(col("event_id"), col("us"))
      val flagged = graft.api.Overlap.rollingRows(evs, col("us"),
          Seq(col("us"), col("event_id")), before = 1, after = 0)(w0 =>
        Seq(first(col("us")).over(w0.rowsBetween(-1, -1)).as("prev_us")))
        .withColumn("new_sess",
          when(col("prev_us").isNull
            || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
      graft.api.Overlap.runningSum(flagged, col("us"),
          Seq(col("us"), col("event_id")), col("new_sess"), "session_id")
        .select(col("event_id"), col("session_id"))
        .orderBy("event_id")
    }),

    // GLOBAL rank / percent_rank / cume_dist (r11) — the tie-honoring
    // trio by reduction to the KEY-LEVEL prefix sum (Overlap.rankGlobal:
    // per-key counts, two-phase cum in key order, join back) — the
    // prefix machinery only ever touches the distinct-key frame
    "window_rank_stats_global" -> ((s, d) => {
      val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
      graft.api.Overlap.rankGlobal(
          events(s, d).select(col("event_id"), col("ts"))
            .withColumn("__day", day),
          col("__day"), "day_rank", "day_pct_rank", "day_cume_dist")
        // RAW doubles: both engines divide the same exact longs, so the
        // IEEE results are bit-identical (the ROUND(x,6) boundary gotcha
        // does not apply)
        .select(col("event_id"), col("day_rank"), col("day_pct_rank"),
          col("day_cume_dist"))
        .orderBy("event_id")
    }),

    // the GENERAL df.map_overlap(fn, before, after) escape hatch (r11) —
    // an arbitrary Scala function over halo'd, globally-ordered row runs
    // (graft.api.Overlap.mapOverlap): here a centered 5-point WEIGHTED
    // smoother (weights 1-2-3-2-1, edge-truncated), the custom-kernel
    // case no declarative frame spells. Exactness discipline: the kernel
    // accumulates DECIMAL(18,2)-quantized values in exact BigDecimal,
    // casts the numerator to double, and divides by the integer weight
    // mass — the same one-rounding-at-the-division rule as
    // window_rolling_global, mirrored literally by the oracle. Halo rows
    // complete the kernel at group boundaries; halo OUTPUTS are dropped
    // (dask's trim rule), so the fn sees a truncated kernel only at the
    // true corpus edges.
    "window_map_overlap" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("ts"),
        col("value"))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("smooth5c",
          org.apache.spark.sql.types.DoubleType)))
      val weights = Array(1, 2, 3, 2, 1)
      graft.api.Overlap.mapOverlap(ev,
          unix_micros(col("ts").cast("timestamp")),
          Seq(col("ts"), col("event_id")), before = 2, after = 2, sch)(
        rows => {
          // DECIMAL(18,2) quantization = the oracle's CAST — ONE
          // BigDecimal per row (the r12 kernel profile: five
          // BigDecimal multiply/adds per row were ~75% of the key's
          // cost); the weighted sum then runs in exact LONG cents.
          // cents/100.0 is the correctly-rounded double of the exact
          // decimal — the same bits BigDecimal(cents, 2).doubleValue
          // yields — so the output is unchanged to the last bit.
          val v = rows.map(r => java.math.BigDecimal.valueOf(r.getDouble(2))
            .setScale(2, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValueExact())
          rows.indices.map { i =>
            var num = 0L
            var den = 0L
            var k = -2
            while (k <= 2) {
              val j = i + k
              if (j >= 0 && j < rows.length) {
                val w = weights(k + 2)
                // addExact/multiplyExact: the cents rewrite is only
                // bit-identical to the BigDecimal form while the
                // weighted sum fits a Long AND |num| <= 2^53 (the
                // long->double conversion below is exact only in that
                // range); a magnitude regression must fail loudly, not
                // drift (r12 ADVICE)
                num = Math.addExact(num, Math.multiplyExact(v(j), w.toLong))
                den += w
              }
              k += 1
            }
            require(math.abs(num) <= (1L << 53),
              s"smooth5c cents sum $num exceeds 2^53 — long->double " +
                "would round; revert this group to BigDecimal arithmetic")
            org.apache.spark.sql.Row(rows(i).getLong(0),
              (num / 100.0) / den)
          }
        })
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "window_row_number" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "window_rank_dense" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |CAST(RANK() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
        |CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_percent_ntile" ->
      """SELECT o_orderstatus, o_orderkey,
        |ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
        |CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "window_cume_dist" ->
      """SELECT o_orderstatus, o_orderkey,
        |CUME_DIST() OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey) AS cdist
        |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id, ts,
        |LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  AS prev_value,
        |LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  AS next_value
        |FROM events ORDER BY event_id""".stripMargin,
    "window_cumsum" ->
      """SELECT event_id, user_id, ts,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS run_total
        |FROM events ORDER BY event_id""".stripMargin,
    "window_rolling_rows" ->
      """SELECT event_id, user_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |/ COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_mean3
        |FROM events ORDER BY event_id""".stripMargin,
    "window_rolling_minmax" ->
      """SELECT event_id, user_id,
        |MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_min3,
        |MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_max3
        |FROM events ORDER BY event_id""".stripMargin,
    "window_rolling_quantile" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |QUANTILE_CONT(l_quantity, 0.5) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |    l_quantity
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_med5
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, roll_med5""".stripMargin,
    "window_rolling_skew" ->
      """WITH c0 AS (SELECT event_id, user_id, ts,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events),
        |m AS (SELECT event_id, user_id,
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        |    CAST(SUM(CAST(c AS HUGEINT)) OVER w AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(c AS HUGEINT) * c) OVER w AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(c AS HUGEINT) * c * c) OVER w AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(c AS HUGEINT) * c * c * c) OVER w AS DOUBLE)
        |      AS s4
        |  FROM c0
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT event_id, user_id, n,
        |    s2/n - (s1/n)*(s1/n) AS va,
        |    s1/n AS m1, s2/n AS m2, s3/n AS m3, s4/n AS m4
        |  FROM m)
        |SELECT event_id, user_id,
        |  CASE WHEN n >= 5 AND va > 0 THEN
        |    ROUND((m3 - 3*m1*m2 + 2*m1*m1*m1) / (va * sqrt(va))
        |      * sqrt(n * (n - 1)) / (n - 2), 6)
        |  END AS skew5,
        |  CASE WHEN n >= 5 AND va > 0 THEN
        |    ROUND(((n + 1) * ((m4 - 4*m1*m3 + 6*m1*m1*m2
        |        - 3*m1*m1*m1*m1) / (va * va) - 3) + 6) * (n - 1)
        |      / ((n - 2) * (n - 3)), 6)
        |  END AS kurt5
        |FROM f ORDER BY event_id""".stripMargin,
    "window_rolling_std" ->
      """SELECT event_id, user_id,
        |CASE WHEN n > 1 THEN
        |  ROUND(sqrt(greatest((sq - s * s / n) / (n - 1), 0.0)), 6)
        |END AS rolling_std3
        |FROM (SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))
        |    * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sq,
        |  CAST(COUNT(*) OVER w AS DOUBLE) AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) t
        |ORDER BY event_id""".stripMargin,
    "window_group_transform" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_extendedprice,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY l_orderkey) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY l_orderkey) AS order_mean_price
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "window_rolling_corr" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |CASE WHEN n = 10 AND (n * sx2 - sx * sx) > 0
        |      AND (n * sy2 - sy * sy) > 0 THEN
        |  ROUND((n * sxy - sx * sy) /
        |    (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
        |END AS rolling_corr10
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |    * CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sxy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |    * CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sy2
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) t
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "window_ewm_mean" -> {
      val num = ewmWeights.zipWithIndex.map { case (wi, i) =>
        s"COALESCE(LAG(value, $i) OVER w * $wi, 0.0)"
      }.mkString(" + ")
      val den = ewmWeights.zipWithIndex.map { case (wi, i) =>
        s"CASE WHEN LAG(value, $i) OVER w IS NOT NULL THEN $wi ELSE 0.0 END"
      }.mkString(" + ")
      s"""SELECT event_id, user_id, ROUND(($num) / ($den), 6) AS ewm_mean
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY event_id""".stripMargin
    },
    "window_cum_extrema" ->
      """SELECT event_id, user_id,
        |MAX(value) OVER w AS cummax,
        |MIN(value) OVER w AS cummin,
        |value - LAG(value, 1) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id) AS diff
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "window_rolling_time" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS sum_7d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS second_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_pct_change" ->
      """SELECT o_custkey, o_orderkey,
        |ROUND((o_totalprice - LAG(o_totalprice) OVER w)
        |  / LAG(o_totalprice) OVER w, 6) AS pct_change
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |  FROM events),
        |g AS (SELECT event_id, user_id, us,
        |  CASE WHEN LAG(us) OVER w IS NULL
        |       OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_id, user_id,
        |  CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_idx
        |FROM g ORDER BY event_id""".stripMargin,
    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS first_price,
        |LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS last_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    // the global-order trio: DuckDB runs the NAIVE un-partitioned window
    // (fine at oracle scale) — the bucket+halo plan must match it exactly
    "window_rolling_global" ->
      """SELECT event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE)
        |/ COUNT(*) OVER (ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS rolling_mean5c
        |FROM events ORDER BY event_id""".stripMargin,
    "window_lag_global" ->
      """SELECT event_id,
        |LAG(value) OVER (ORDER BY ts, event_id) AS prev_value,
        |LEAD(value) OVER (ORDER BY ts, event_id) AS next_value,
        |CAST(CAST(value AS DECIMAL(18,2))
        |  - LAG(CAST(value AS DECIMAL(18,2)))
        |    OVER (ORDER BY ts, event_id) AS DOUBLE) AS diff_value
        |FROM events ORDER BY event_id""".stripMargin,
    "window_cumsum_global" ->
      """SELECT event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS run_total
        |FROM events ORDER BY event_id""".stripMargin,
    "window_row_number_global" ->
      """SELECT event_id,
        |ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY event_id""".stripMargin,
    "window_dense_rank_global" ->
      """SELECT event_id,
        |DENSE_RANK() OVER (ORDER BY epoch_us(ts) // 86400000000)
        |  AS day_rank
        |FROM events ORDER BY event_id""".stripMargin,
    "window_ntile_global" ->
      """SELECT event_id,
        |CAST(NTILE(7) OVER (ORDER BY ts, event_id) AS INT) AS tile7
        |FROM events ORDER BY event_id""".stripMargin,
    "window_sessionize_global" ->
      """WITH f AS (SELECT event_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |        ORDER BY epoch_us(ts), event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER (
        |        ORDER BY epoch_us(ts), event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events)
        |SELECT event_id,
        |  CAST(SUM(new_sess) OVER (ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM f ORDER BY event_id""".stripMargin,
    "window_rank_stats_global" ->
      """SELECT event_id,
        |RANK() OVER (ORDER BY epoch_us(ts) // 86400000000) AS day_rank,
        |PERCENT_RANK() OVER (ORDER BY epoch_us(ts) // 86400000000)
        |  AS day_pct_rank,
        |CUME_DIST() OVER (ORDER BY epoch_us(ts) // 86400000000)
        |  AS day_cume_dist
        |FROM events ORDER BY event_id""".stripMargin,
    "window_rolling_time_global" ->
      """SELECT event_id,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |  ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS sum_24h
        |FROM events ORDER BY event_id""".stripMargin,
    // centered 1-2-3-2-1 smoother, edge-truncated: exact decimal
    // numerator cast to double, divided by the integer weight mass —
    // literally the arithmetic the mapOverlap kernel runs
    "window_map_overlap" ->
      """WITH t AS (SELECT event_id,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    LAG(CAST(value AS DECIMAL(18,2)), 2) OVER w AS l2,
        |    LAG(CAST(value AS DECIMAL(18,2)), 1) OVER w AS l1,
        |    LEAD(CAST(value AS DECIMAL(18,2)), 1) OVER w AS n1,
        |    LEAD(CAST(value AS DECIMAL(18,2)), 2) OVER w AS n2
        |  FROM events WINDOW w AS (ORDER BY ts, event_id))
        |SELECT event_id,
        |  CAST(COALESCE(l2, 0) * 1 + COALESCE(l1, 0) * 2 + v * 3
        |     + COALESCE(n1, 0) * 2 + COALESCE(n2, 0) * 1 AS DOUBLE)
        |  / ((CASE WHEN l2 IS NULL THEN 0 ELSE 1 END)
        |   + (CASE WHEN l1 IS NULL THEN 0 ELSE 2 END) + 3
        |   + (CASE WHEN n1 IS NULL THEN 0 ELSE 2 END)
        |   + (CASE WHEN n2 IS NULL THEN 0 ELSE 1 END)) AS smooth5c
        |FROM t ORDER BY event_id""".stripMargin
  )
}
