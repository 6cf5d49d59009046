package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hard signal for the oracle-less aggregate keys. */
class AggregationsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  test("agg_quantile_approx within 2% of exact percentiles (sf0.01)") {
    val approx = SparkEntry.queries("agg_quantile_approx")(
        spark, SparkFixture.sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = graft.util.Tables.orders(spark, SparkFixture.sf001)
      .groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("m"),
        percentile(col("o_totalprice"), lit(0.9)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    exact.foreach { case (k, (m, p)) =>
      assert(math.abs(approx(k)._1 - m) / m < 0.02,
        s"$k median: approx ${approx(k)._1} vs exact $m")
      assert(math.abs(approx(k)._2 - p) / p < 0.02,
        s"$k p90: approx ${approx(k)._2} vs exact $p")
    }
  }

  test("salted aggregation equals the plain groupBy exactly") {
    val salted = SparkEntry.queries("agg_salted_skew")(
      spark, SparkFixture.sf0001).collect().map(_.toString).toSeq
    val plain = graft.util.Tables.events(spark, SparkFixture.sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(salted == plain)
  }
}
