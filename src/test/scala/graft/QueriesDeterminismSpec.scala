package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001, returns rows, and is deterministic
  * across a double run (SURVEY §5.2.3) — catches order/tie nondeterminism
  * before the driver's hash gate does. */
class QueriesDeterminismSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  // keys whose correct sf0.001 result may legitimately be empty
  private val mayBeEmpty = Set("llm_dedup_jaccard", "llm_dedup_near_minhash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: non-empty + deterministic double-run (sf0.001)") {
      val r1 = fn(spark, SparkFixture.sf0001).collect().map(_.toString).toSeq
      if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned 0 rows")
      val r2 = fn(spark, SparkFixture.sf0001).collect().map(_.toString).toSeq
      assert(r1 == r2, s"$name not deterministic across runs")
    }
  }

  test("entry: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys, with matching names") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
