package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions entry point: exposes graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works for SQL-surface users too, and injects the
  * [[functions.RewriteDotProduct]] optimizer rule so the declarative
  * zip_with/aggregate dot-product idiom compiles to the codegen'd native
  * expression.
  *
  * Wire-up: `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`); an existing session can
  * call `GraftExtensions.register(spark)` directly.
  *
  * This is the (c)-tier extension point from the design rules. No custom
  * Strategy/SparkPlan exists because every operator's SEMANTICS are
  * expressible in Catalyst's built-in operators (SURVEY §4 conclusion);
  * the one injected Rule is a pure PERFORMANCE rewrite with an exact
  * semantics-preservation guard.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => functions.RewriteDotProduct)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name requires exactly $n arguments, got ${args.length}")
      build(args)
    }

  private[graft] val definitions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      arity("graft_dot", 2)(args => DotProductFloat(args(0), args(1)))),
    ("graft_sorted_intersection_size",
      new ExpressionInfo(classOf[SortedIntersectionSize].getName,
        "graft_sorted_intersection_size"),
      arity("graft_sorted_intersection_size", 2)(args =>
        SortedIntersectionSize(args(0), args(1)))),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[WordShingleHashes].getName,
        "graft_shingle_hashes"),
      arity("graft_shingle_hashes", 2)(args =>
        WordShingleHashes(args(0), intLit(args(1), "shingle width")))),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      arity("graft_minhash_sig", 2)(args =>
        MinHashSig(args(0), intLit(args(1), "signature size")))),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      arity("graft_simhash64", 1)(args => SimHash64(args(0)))),
    ("graft_minhash_md5",
      new ExpressionInfo(classOf[MinHashMd5Sigs].getName,
        "graft_minhash_md5"),
      arity("graft_minhash_md5", 2)(args =>
        MinHashMd5Sigs(args(0), intLit(args(1), "signature size")))),
    ("graft_minhash_km",
      new ExpressionInfo(classOf[MinHashKMSigs].getName,
        "graft_minhash_km"),
      arity("graft_minhash_km", 2)(args =>
        MinHashKMSigs(args(0), intLit(args(1), "signature size")))))

  /** Register into an already-built session (functions + the dot-product
    * rewrite rule via the experimental-methods slot, which runs at the
    * end of optimization like an injected rule). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(functions.RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ functions.RewriteDotProduct
  }
}
