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
        |  graft_simhash64(array('a','b','c')) AS sh,
        |  size(graft_minhash_md5(array('a b c'), 16)) AS nmd5,
        |  size(graft_minhash_km(array('a b c'), 16)) AS nkm
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 2) // "a b c", "b c d"
    assert(r.getInt(3) == 16)
    assert(r.getInt(5) == 16 && r.getInt(6) == 16)
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
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.functions.RewriteDotProduct) == 1,
      "double registration must not stack the rewrite rule")
  }

  test("RewriteDotProduct: the declarative fold compiles to the native " +
      "expression and preserves ragged/null-element semantics") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // parquet-backed input: a purely local relation constant-folds away
    // before the plan is observable, so the rule has nothing to rewrite
    val emb = graft.util.Tables.embeddings(spark, SparkFixture.sf0001)
      .limit(5)
      .select(col("vec_id"), col("embedding").as("a"),
        col("embedding").as("b"))
    // the SURVEY §2.J declarative recipe, verbatim
    def fold = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val out = emb.select(col("vec_id"), fold.as("dot"))
    assert(out.queryExecution.executedPlan.toString
      .contains("dot_product_float"),
      s"rule did not fire:\n${out.queryExecution.executedPlan}")
    // values must equal the native expression called directly (unit-norm
    // vectors dotted with themselves ≈ 1.0)
    val direct = emb.select(col("vec_id"),
      graft.functions.VectorExprs.dotf(col("a"), col("b")).as("dot"))
    assert(out.orderBy("vec_id").collect().map(_.toString).toSeq ==
      direct.orderBy("vec_id").collect().map(_.toString).toSeq)
    // null ELEMENT (containsNull=true schema) must also yield NULL, and
    // a float-typed multiply (no double casts) must NOT be rewritten
    val nullElem = spark.sql(
      """SELECT aggregate(zip_with(
        |  array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |  array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).head()
    assert(nullElem.isNullAt(0), "null element must null the fold")
    val floatMul = emb.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!floatMul.queryExecution.executedPlan.toString
      .contains("dot_product_float"),
      "float-typed multiply is not bit-equal to the double fold — " +
        "must not rewrite")
  }
}
