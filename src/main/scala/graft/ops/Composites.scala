package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Det._
import graft.util.Tables._

/** Composite analytical queries + scale-technique showcases (round 4).
  *
  * The per-operator keys in the sibling modules exercise one operator
  * each; a user of the reference library chains them. These keys pin the
  * CHAINS: classic TPC-H-shaped multi-join plans (Q3/Q5/Q10 adapted to
  * the fixture schema) where join order, broadcast choice, partial
  * aggregation, and top-k pushdown all have to compose correctly in ONE
  * Catalyst plan, plus two standalone scale techniques (Bloom-filter join
  * pruning, fixed-width histogram) that a 100 TB pipeline reaches for
  * daily.
  *
  * Scale notes:
  *  - the dimension side of every join is hint-broadcast only when its
  *    size is *schema-bounded* (region 5, nation 25 — constant at any
  *    SF); customer/supplier/orders grow with the corpus, so their joins
  *    stay shuffle equi-joins and AQE may locally promote them — the
  *    llm_lang_id rule (SCALE.md).
  *  - every money aggregate runs in DECIMAL (Det.dsumExpr idiom) so sums
  *    are addition-order-free across partition counts and engines.
  *  - top-k = orderBy + limit compiles to TakeOrderedAndProject (no
  *    global sort materialization; per-partition heap + driver merge of
  *    k rows).
  */
object Composites {

  /** revenue term shared by the TPC-H-shaped queries: exact decimal
    * l_extendedprice * (1 - l_discount). */
  private def revTerm =
    dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
  private val revTermSql =
    """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape (shipping priority): segment-filtered customers'
    // not-yet-shipped orders, top 10 by open revenue. Filters sit directly
    // on the scans (pushdown), the two big joins shuffle on their keys,
    // the final top-k is TakeOrderedAndProject.
    "tpch_q3" -> ((s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1999-03-15").cast("timestamp_ntz"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1999-03-15").cast("timestamp_ntz"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsumExpr(revTerm).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    // TPC-H Q5 shape (local-supplier volume): six-table star join where
    // the customer and the supplier must sit in the SAME nation, revenue
    // per nation for one region-year slice. region/nation are the only
    // hint-broadcast sides (constant-size dims); supplier/customer joins
    // shuffle. The c_nationkey = s_nationkey predicate rides the supplier
    // join as a second equi-key — never a post-join filter over a wider
    // intermediate.
    "tpch_q5" -> ((s, d) => {
      val asiaNations = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsumExpr(revTerm).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    // per customer for one quarter, top 20 customers. The groupBy keys
    // include the customer attributes (functionally dependent on
    // c_custkey) so no second join is needed after the aggregate.
    "tpch_q10" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1998-10-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(dsumExpr(revTerm).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // TPC-H Q12 shape (shipping-mode priority audit): per lineitem status,
    // how many high- vs low-priority orders shipped in one year —
    // conditional aggregation over a fact-fact join. The count terms are
    // when().otherwise() integer sums (partial-agg friendly, no second
    // pass); l_linestatus stands in for the missing l_shipmode column.
    "tpch_q12" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT"
            || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")),

    // TPC-H Q4 shape (order-priority checking): orders in one quarter
    // that had at least one returned item, counted per priority — the
    // EXISTS-subquery-as-semi-join pattern. The semi-join never widens a
    // row (probe side streams, only the key set matters) and the date
    // filter is pushed to the orders scan, so at 100 TB the shuffle
    // carries one quarter's keys, not the fact table.
    "tpch_q4" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-07-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1998-10-01").cast("timestamp_ntz"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // TPC-H Q14 shape (promotion effect): share of one month's revenue
    // from promo parts — conditional-sum ratio over a fact⋈dim join.
    // Both sums come out of ONE aggregate pass in exact decimal; the
    // final ratio is the only floating step, computed identically
    // (100·promo)/total in both engines from the same exact inputs.
    "tpch_q14" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-09-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-10-01").cast("timestamp_ntz"))
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * sum(when(col("p_type") === "PROMO", revTerm)
              .otherwise(dec(lit(0)))).cast("double")
            / sum(revTerm).cast("double")).as("promo_revenue_pct"),
          dsumExpr(when(col("p_type") === "PROMO", revTerm)
            .otherwise(dec(lit(0)))).as("promo_revenue"))),

    // TPC-H Q18 shape (large-volume customers): orders whose total
    // quantity exceeds a threshold, with the customer attached — the
    // aggregate-then-having-then-join pattern. The quantity aggregate
    // runs FIRST and only qualifying orderkeys (rare by construction)
    // join back to orders/customer, so the expensive join input shrinks
    // before any wide row is formed.
    "tpch_q18" -> ((s, d) => {
      val bigOrders = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      bigOrders
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q6 (forecasting revenue change) — THE canonical scan-filter-
    // aggregate microbenchmark: every predicate pushes to the parquet
    // scan, no join, no shuffle beyond the final 1-row reduce. At 100 TB
    // this plan is pure scan bandwidth (row-group min/max skipping does
    // the rest) — if this query is slow, the storage layout is wrong,
    // not the engine.
    "tpch_q6" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(dsumExpr(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q19 shape (discounted revenue, disjunctive bands): revenue
    // over an OR of three (brand, size-band, quantity-band) predicates.
    // The join key is conjunctive (l_partkey = p_partkey) so the join
    // stays a plain equi-join; the disjunction is a post-join filter that
    // Catalyst additionally DISTRIBUTES into per-scan prefilters (the
    // brand/size disjunction's union reaches the part scan, the quantity
    // union the lineitem scan) — rows matching no band never shuffle.
    "tpch_q19" -> ((s, d) => {
      val bands =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35)
          && col("l_quantity").between(20, 30))
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(bands)
        .agg(dsumExpr(revTerm).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Bloom-filter join pruning — the explicit form of the runtime filter
    // a 100 TB engine injects on every selective join (Spark's own
    // InjectRuntimeFilter does this under AQE): build a bounded-size
    // Bloom sketch of the small side's join keys (ONE distributed
    // aggregate; the sketch is ~18 KB at 1% fpp for 10k keys and its
    // size is chosen up front, never data-proportional), probe it
    // map-side on the big table BEFORE the shuffle, then let the exact
    // semi-join remove the false positives. Result is bit-identical to
    // the plain semi-join — the bloom stage only moves work off the
    // shuffle — so the oracle is the plain semi-join SQL.
    "join_bloom_prefilter" -> ((s, d) => {
      val keys = supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_suppkey"))
      val bf = keys.stat.bloomFilter("s_suppkey", 10000L, 0.01)
      val mightContain = udf((k: Long) => bf.mightContainLong(k))
      lineitem(s, d)
        .filter(mightContain(col("l_suppkey")))
        .join(keys, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_suppkey")
    }),

    // fixed-width histogram (the profiling primitive): one partial+final
    // aggregate over bin = floor(price / width). Identical IEEE double
    // division + floor on both engines; 2-dp money exactly at a bin edge
    // (k*1000.00) is an exact double, so the quotient is exact and the
    // edge cannot flip.
    "agg_histogram" -> ((s, d) =>
      orders(s, d)
        .groupBy(floor(col("o_totalprice") / 1000.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bin")),

    // TPC-H Q7 shape (volume shipping between two nations): revenue per
    // (supplier nation, customer nation, year) for the two directed
    // pairs of one nation pair. The SAME constant-size nation dim is
    // broadcast TWICE under different role names (n1 = supplier side,
    // n2 = customer side) — the self-role-join pattern every
    // region-to-region report needs; the disjunctive pair filter sits on
    // the two broadcast outputs, so it prunes before the fact shuffles.
    "tpch_q7" -> ((s, d) => {
      val n1 = broadcast(nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      supplier(s, d)
        .join(lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3"
            && col("cust_nation") === "NATION_7")
          || (col("supp_nation") === "NATION_7"
            && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsumExpr(revTerm).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q9 shape (product-type profit, adapted: the fixture has no
    // partsupp/supplycost, so profit = revenue): revenue per (supplier
    // nation, order year) over name-matched parts. The LIKE filter
    // prunes the part dim BEFORE its join (pushed to the scan); nation
    // broadcast; year extraction groups post-join.
    "tpch_q9" -> ((s, d) =>
      part(s, d).filter(col("p_name").like("%a%"))
        .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsumExpr(revTerm).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)),

    // TPC-H Q13 shape (customer order-count distribution): LEFT join so
    // zero-order customers keep count 0, with a residual predicate ON
    // the join (not a post-filter — that would turn the left join into
    // an inner one), then a second aggregate over the first's output —
    // the two-level "histogram of group sizes" pattern. Both aggregates
    // partial-agg; the second one's input is one row per customer.
    "tpch_q13" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d),
          col("c_custkey") === col("o_custkey")
            && col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    // keep the max-revenue supplier(s) — aggregate → scalar-max →
    // equality-join-back. The comparison runs on the EXACT decimal sums
    // (a double tie at the top would be engine-dependent); the 1-row max
    // broadcasts. Revenue is cast to double only at output.
    "tpch_q15" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revTerm).as("rev_dec"))
      val top = rev.agg(max(col("rev_dec")).as("max_dec"))
      supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(top), col("rev_dec") === col("max_dec"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): lineitems below
    // 20% of their part's average quantity, for one brand. The
    // correlated AVG subquery becomes a per-part aggregate joined back;
    // the threshold compare is INTEGER-EXACT (5·q·n < Σq in decimal —
    // algebraically q < 0.2·avg, no engine-dependent division), and only
    // the final /7.0 runs in floating point. The brand filter prunes
    // part before the join, and the per-part aggregate runs over ONLY
    // the brand's lineitems (semi-join first) — at 100 TB the avg
    // aggregate never touches the other brands' rows.
    "tpch_q17" -> ((s, d) => {
      val brandParts = part(s, d).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val brandLines = lineitem(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val perPart = brandLines.groupBy(col("l_partkey").as("ap_key"))
        .agg(sum(dec(col("l_quantity"))).as("qsum"),
          count(lit(1)).as("qn"))
      brandLines
        .join(perPart, col("l_partkey") === col("ap_key"))
        .filter(lit(5) * dec(col("l_quantity")) * col("qn") < col("qsum"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape (adapted to the fixture: no receipt/commit dates,
    // so "kept waiting" = the ONLY supplier whose lines were returned in
    // a finished multi-supplier order): the classic EXISTS + NOT-EXISTS
    // double correlation — a conditional semi-join (same order, another
    // supplier) then a conditional anti-join (same order, another
    // supplier, also returned). Both compile to one-pass hash joins on
    // l_orderkey with the supplier inequality as residual; no row ever
    // widens.
    "tpch_q21" -> ((s, d) => {
      val l1 = lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
      val l2 = lineitem(s, d)
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(l2, col("o1") === col("o2") && col("s1") =!= col("s2"),
          "left_semi")
        .join(l3, col("o1") === col("o3") && col("s1") =!= col("s3"),
          "left_anti")
        .join(supplier(s, d), col("s1") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q1 (the canonical pricing summary, FULL 8-aggregate output —
    // the flagship agg_groupby_basic is this shape with fewer columns):
    // one scan, one partial+final aggregate, every money sum in exact
    // decimal, averages as decimal-sum/count. At 100 TB this is the
    // purest partial-aggregation showcase: 6 groups total, so the final
    // shuffle carries 6 rows per partition regardless of input size.
    "tpch_q1" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExpr(revTerm).as("sum_disc_price"),
          dsumExpr(revTerm * (lit(1) + dec(col("l_tax")))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q2 shape (min-cost supplier, adapted: no partsupp, so the
    // supply relation is the DISTINCT (part, supplier) pairs observed in
    // lineitem and s_acctbal proxies the supply cost): for each size-25
    // part, the cheapest European supplier — the correlated-MIN-subquery
    // pattern as a per-part aggregate joined back on equality. The
    // region/nation dims broadcast; the distinct supply projection is
    // computed ONCE and reused for both the candidate rows and the min.
    "tpch_q2" -> ((s, d) => {
      val ps = lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val euroSupp = supplier(s, d)
        .join(broadcast(nation(s, d)
          .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
      val supply = ps.join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      val minCost = supply.groupBy(col("l_partkey").as("mpk"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      part(s, d).filter(col("p_size") === 25)
        .join(supply, col("p_partkey") === col("l_partkey"))
        .join(minCost,
          col("mpk") === col("l_partkey")
            && col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q8 shape (national market share): one nation's suppliers'
    // share of total revenue per order year — the ratio-of-conditional-
    // sums pattern with BOTH sums from ONE aggregate pass in exact
    // decimal, finished by a single double division.
    "tpch_q8" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("n_name") === "NATION_5", revTerm)
              .otherwise(dec(lit(0)))).cast("double")
            / sum(revTerm).cast("double")).as("mkt_share"),
          dsumExpr(when(col("n_name") === "NATION_5", revTerm)
            .otherwise(dec(lit(0)))).as("nation_revenue"))
        .orderBy("o_year")),

    // TPC-H Q11 shape (important stock, adapted: part value = total
    // lineitem extended price; the original's one-nation filter is
    // dropped — the tiniest fixture has no lines for a fixed nation and
    // the filter is flavor, not the plan shape): parts whose value
    // exceeds 1.5× the MEAN part value (the original's fixed 0.0001
    // fraction is calibrated to one SF; mean-relative is the scale-free
    // twin) — the HAVING-against-a-scalar-aggregate pattern; the global
    // total+count is a 1-row broadcast and the threshold compare is
    // INTEGER-EXACT (2·value·n > 3·total in decimal, never a double
    // fraction).
    "tpch_q11" -> ((s, d) => {
      val perPart = lineitem(s, d).groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("val_dec"))
      val tot = perPart.agg(sum(col("val_dec")).as("tot_dec"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("val_dec") * col("n_parts") * 2 > col("tot_dec") * 3)
        .select(col("l_partkey"),
          col("val_dec").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // TPC-H Q16 shape (supplier-count distribution, adapted: the
    // complaint exclusion becomes negative-balance suppliers): distinct
    // supplier counts per (brand, type, size) over the observed supply
    // pairs, excluding one brand and the bad suppliers — NOT-IN as an
    // anti-join BEFORE the fact join, count distinct per multi-key
    // group.
    "tpch_q16" -> ((s, d) => {
      val ps = lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val badSupp = supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      ps.join(broadcast(badSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(part(s, d).filter(col("p_brand") =!= "Brand#45"
            && col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape (excess-stock suppliers, adapted: "supplied more
    // than half a part's yearly volume" replaces the partsupp availqty
    // test): nested per-(part, supplier) vs per-part aggregates with an
    // integer-exact 2·sq > total compare, then a semi-join back to
    // supplier — no wide row ever forms, and the name-matched part set
    // broadcasts into the lineitem scan.
    "tpch_q20" -> ((s, d) => {
      val pk = part(s, d).filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val ln = lineitem(s, d)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
      val perPartSupp = ln.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("sq"))
      val perPart = ln.groupBy(col("l_partkey").as("pk2"))
        .agg(sum(dec(col("l_quantity"))).as("tq"))
      val qualified = perPartSupp
        .join(perPart, col("l_partkey") === col("pk2"))
        .filter(col("sq") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      supplier(s, d)
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q22 shape (global-acctbal anti-join, adapted: grouped by
    // nation instead of the absent phone country code, and "never
    // ordered" relaxed to "never placed an URGENT order" — every fixture
    // customer has some order): customers richer than the positive-
    // balance average without an urgent order. The global average is ONE
    // tiny aggregate broadcast as a 1-row cross join, and the compare is
    // integer-exact (bal·n > Σbal in decimal — never a double mean); the
    // anti-join probes only the urgent subset's keys (filter pushed
    // below the anti-join build side).
    "tpch_q22" -> ((s, d) => {
      val bal = customer(s, d).filter(col("c_acctbal") > 0)
        .agg(sum(dec(col("c_acctbal"))).as("bsum"),
          count(lit(1)).as("bn"))
      customer(s, d)
        .crossJoin(broadcast(bal))
        .filter(dec(col("c_acctbal")) * col("bn") > col("bsum"))
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // CORPUS HEALTHCHECK — the one-sheet top-lines a curation run reads
    // before anything ships (the scalar companion of llm_dataset_card's
    // per-(source, lang) profile): size, duplication and balance
    // top-lines in ONE plan — two corpus aggregates (global counts +
    // per-source counts for the balance entropy), a broadcast of the
    // two 1-row/|sources|-row results, and an in-row struct explode to
    // the (metric, value) sheet (the prep_profile unpivot idiom).
    // Counts and the entropy's nano-unit term sum are EXACT integers
    // (the drift discipline absorbs ln ulp differences); every ratio
    // is one IEEE division — the whole card hash-checks.
    "llm_corpus_healthcheck" -> ((s, d) => {
      val docs = documents(s, d)
      val toks = split(col("text"), " ")
      val g = docs.agg(
        count(lit(1)).as("__nd"),
        sum(size(toks)).as("__nt"),
        sum(length(col("text"))).as("__nc"),
        countDistinct(md5(col("text"))).as("__ndist"))
      val bySrc = docs.groupBy("source").agg(count(lit(1)).as("__ns"))
      val p = col("__ns").cast("double") / col("__nd").cast("double")
      val ent = bySrc
        .crossJoin(broadcast(g.select(col("__nd"))))
        .select(round(-p * log(p) * 1e9).cast("long").as("__e"))
        .agg(sum(col("__e")).as("__entn"), count(lit(1)).as("__nsrc"))
      def m(name: String, value: org.apache.spark.sql.Column) =
        struct(lit(name).as("metric"), value.as("value"))
      g.crossJoin(broadcast(ent))
        .select(explode(array(
          m("n_docs", col("__nd").cast("double")),
          m("n_tokens", col("__nt").cast("double")),
          m("n_chars", col("__nc").cast("double")),
          m("n_sources", col("__nsrc").cast("double")),
          m("exact_dup_frac", lit(1.0) -
            col("__ndist").cast("double") / col("__nd").cast("double")),
          m("mean_tokens_per_doc",
            col("__nt").cast("double") / col("__nd").cast("double")),
          m("mean_chars_per_token",
            col("__nc").cast("double") / col("__nt").cast("double")),
          m("source_entropy_nats",
            col("__entn").cast("double") / lit(1e9)))).as("__m"))
        .select(col("__m.metric").as("metric"),
          col("__m.value").as("value"))
        .orderBy("metric")
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_corpus_healthcheck" ->
      """WITH g AS (SELECT COUNT(*) AS nd,
        |    SUM(len(string_split_regex(text, ' '))) AS nt,
        |    SUM(len(text)) AS nc,
        |    COUNT(DISTINCT md5(text)) AS ndist
        |  FROM documents),
        |s AS (SELECT source, COUNT(*) AS ns FROM documents
        |  GROUP BY source),
        |e AS (SELECT CAST(SUM(CAST(ROUND(
        |      -(CAST(ns AS DOUBLE) / g.nd)
        |        * ln(CAST(ns AS DOUBLE) / g.nd) * 1e9) AS BIGINT))
        |    AS BIGINT) AS entn,
        |    COUNT(*) AS nsrc
        |  FROM s, g)
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(nd AS DOUBLE) AS value FROM g
        |  UNION ALL SELECT 'n_tokens', CAST(nt AS DOUBLE) FROM g
        |  UNION ALL SELECT 'n_chars', CAST(nc AS DOUBLE) FROM g
        |  UNION ALL SELECT 'n_sources', CAST(nsrc AS DOUBLE) FROM e
        |  UNION ALL SELECT 'exact_dup_frac',
        |    1.0 - CAST(ndist AS DOUBLE) / CAST(nd AS DOUBLE) FROM g
        |  UNION ALL SELECT 'mean_tokens_per_doc',
        |    CAST(nt AS DOUBLE) / CAST(nd AS DOUBLE) FROM g
        |  UNION ALL SELECT 'mean_chars_per_token',
        |    CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE) FROM g
        |  UNION ALL SELECT 'source_entropy_nats',
        |    CAST(entn AS DOUBLE) / 1e9 FROM e) t
        |ORDER BY metric""".stripMargin,
    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-03-15'
         |  AND l_shipdate > TIMESTAMP '1999-03-15'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1998-10-01'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-07-01'
        |  AND o_orderdate < TIMESTAMP '1998-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q14" ->
      s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN $revTermSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(SUM($revTermSql) AS DOUBLE) AS promo_revenue_pct,
         |  CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN $revTermSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1998-09-01'
         |  AND l_shipdate < TIMESTAMP '1998-10-01'""".stripMargin,
    "tpch_q18" ->
      s"""WITH big AS (SELECT l_orderkey,
         |    ${dsumSql("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${dsumSql("l_quantity")} > 300.0)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         |  total_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_qty DESC, o_orderkey
         |LIMIT 100""".stripMargin,
    "tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q19" ->
      s"""SELECT CAST(SUM($revTermSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "join_bloom_prefilter" ->
      s"""SELECT l_suppkey, COUNT(*) AS n_items,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_suppkey IN (
         |  SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
         |GROUP BY l_suppkey
         |ORDER BY l_suppkey""".stripMargin,
    "agg_histogram" ->
      s"""SELECT CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY 1
         |ORDER BY bin""".stripMargin,
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($revTermSql
         |    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
         |    AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q2" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |sup AS (SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name
        |  FROM ps JOIN rs ON l_suppkey = s_suppkey),
        |mc AS (SELECT l_partkey AS mpk, MIN(s_acctbal) AS min_bal
        |  FROM sup GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part
        |JOIN sup ON p_partkey = l_partkey
        |JOIN mc ON mpk = l_partkey AND s_acctbal = min_bal
        |WHERE p_size = 25
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q8" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |  CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN $revTermSql
         |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(SUM($revTermSql) AS DOUBLE) AS mkt_share,
         |  CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN $revTermSql
         |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    AS nation_revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "tpch_q11" ->
      s"""WITH pp AS (SELECT l_partkey,
         |    SUM(${decSql("l_extendedprice")}) AS val_dec
         |  FROM lineitem GROUP BY 1),
         |t AS (SELECT SUM(val_dec) AS tot_dec, COUNT(*) AS n_parts
         |  FROM pp)
         |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
         |FROM pp, t WHERE val_dec * n_parts * 2 > tot_dec * 3
         |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "tpch_q16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20" ->
      s"""WITH pk AS (SELECT p_partkey FROM part
         |  WHERE p_name LIKE 'red%'),
         |ln AS (SELECT l_partkey, l_suppkey, l_quantity
         |  FROM lineitem JOIN pk ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |    AND l_shipdate < TIMESTAMP '1999-01-01'),
         |pss AS (SELECT l_partkey, l_suppkey,
         |    SUM(${decSql("l_quantity")}) AS sq
         |  FROM ln GROUP BY 1, 2),
         |pt AS (SELECT l_partkey AS pk2,
         |    SUM(${decSql("l_quantity")}) AS tq
         |  FROM ln GROUP BY 1),
         |q AS (SELECT DISTINCT l_suppkey FROM pss
         |  JOIN pt ON l_partkey = pk2 WHERE sq * 2 > tq)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (SELECT l_suppkey FROM q)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS revenue
         |FROM supplier
         |JOIN lineitem ON s_suppkey = l_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q9" ->
      s"""SELECT n_name AS nation,
         |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |  CAST(SUM($revTermSql) AS DOUBLE) AS sum_profit
         |FROM part
         |JOIN lineitem ON p_partkey = l_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%a%'
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q15" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    SUM($revTermSql) AS rev_dec
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name,
         |  CAST(rev_dec AS DOUBLE) AS total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q17" ->
      s"""WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#23'),
         |pp AS (SELECT l_partkey AS ap_key,
         |    SUM(${decSql("l_quantity")}) AS qsum,
         |    COUNT(*) AS qn
         |  FROM bl GROUP BY l_partkey)
         |SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly,
         |  COUNT(*) AS n_lines
         |FROM bl JOIN pp ON l_partkey = ap_key
         |WHERE 5 * ${decSql("l_quantity")} * qn < qsum""".stripMargin,
    "tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "tpch_q22" ->
      s"""WITH bal AS (SELECT SUM(${decSql("c_acctbal")}) AS bsum,
         |    COUNT(*) AS bn
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_nationkey, COUNT(*) AS numcust,
         |  ${dsumSql("c_acctbal")} AS totacctbal
         |FROM customer, bal
         |WHERE ${decSql("c_acctbal")} * bn > bsum
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin
  )
}
