package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions are reachable from plain SQL once registered
  * (SparkSessionExtensions wiring, or register() on a live session). */
class ExtensionsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  test("graft_* SQL functions register and evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  graft_sorted_intersection_size(array(1L, 2L, 5L),
        |                                 array(2L, 3L, 5L)) AS i,
        |  size(graft_shingle_hashes(array('a','b','c','d'), 3)) AS nsh,
        |  size(graft_minhash_sig(array(1L, 2L, 3L), 16)) AS nmh,
        |  graft_simhash64(array('a','b','c')) AS sh
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 2) // "a b c", "b c d"
    assert(r.getInt(3) == 16)
    // pin the SQL-registered function against the Column-API form of the
    // same expression (itself pinned by the planted-duplicate specs)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumnApi = Seq(Seq("a", "b", "c")).toDF("tk")
      .select(graft.functions.VectorExprs.simhash64(col("tk")))
      .head().getLong(0)
    assert(r.getLong(4) == viaColumnApi,
      "SQL registration must evaluate the same expression as the Column API")
  }

  test("registration is idempotent and deterministic") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val a = spark.sql("SELECT graft_minhash_sig(array(7L), 4)").head().getSeq[Long](0)
    val b = spark.sql("SELECT graft_minhash_sig(array(7L), 4)").head().getSeq[Long](0)
    assert(a == b)
  }
}
