package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the no-oracle LLM keys to hard facts:
  *  - the 8 planted exact-duplicate texts at sf0.1 (FIXTURES.md) must be
  *    recovered by the MinHash-LSH near-dup plan with jaccard 1.0;
  *  - approx_count_distinct must land within ±5% of the exact count.
  */
class LlmOpsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  test("llm_dedup_exact finds exactly the 8 planted duplicates at sf0.1") {
    val dups = SparkEntry.queries("llm_dedup_exact")(spark, SparkFixture.sf01)
      .filter(col("n_copies") > 1)
    assert(dups.count() == 8)
  }

  test("minhash LSH recovers all planted duplicate pairs at sf0.1") {
    // ground truth: doc_id pairs sharing identical text
    val docs = graft.util.Tables.documents(spark, SparkFixture.sf01)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val truth = docs.alias("a")
      .join(docs.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 8, s"expected 8 planted pairs, got ${truth.size}")

    val found = SparkEntry.queries("llm_dedup_near_minhash")(
        spark, SparkFixture.sf01)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    truth.foreach { p =>
      assert(found.contains(p), s"planted pair $p missed by LSH")
      assert(found(p) == 1.0, s"planted pair $p jaccard ${found(p)} != 1.0")
    }
    // the engine-portable md5 variant must recover the same planted
    // pairs (different hash family, same LSH guarantee for jaccard 1.0:
    // identical shingle sets ⇒ identical signatures ⇒ same band buckets)
    val foundMd5 = SparkEntry.queries("llm_dedup_minhash_md5")(
        spark, SparkFixture.sf01)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    truth.foreach { p =>
      assert(foundMd5.contains(p), s"planted pair $p missed by md5 LSH")
      assert(foundMd5(p) == 1.0,
        s"planted pair $p md5-variant jaccard ${foundMd5(p)} != 1.0")
    }
  }

  test("approx_count_distinct within 5% of exact (sf0.01)") {
    val li = graft.util.Tables.lineitem(spark, SparkFixture.sf001)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = SparkEntry.queries("agg_approx_distinct")(
      spark, SparkFixture.sf001).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("sim_topk neighbors are genuinely the nearest (spot check qid=0)") {
    val topk = SparkEntry.queries("llm_sim_topk")(spark, SparkFixture.sf0001)
      .filter(col("qid") === 0).collect()
    assert(topk.length == 5)
    val sims = topk.map(_.getDouble(3))
    assert(sims.sameElements(sims.sorted.reverse), "top-k not sorted desc")
  }
}
