package graft.functions

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the DECLARATIVE dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  *     DOUBLE)), 0D, (acc, v) -> acc + v) }}}
  *
  * over two `array<float>` attributes into the native codegen'd
  * [[DotProductFloat]] — users who write the idiomatic HOF form (the
  * SURVEY §2.J recipe) get the JIT'd sequential loop for free. This is
  * the (c)-tier `SparkSessionExtensions` Rule slot, used here for
  * PERFORMANCE only — semantics are preserved exactly:
  *
  *  - [[DotProductFloat]] folds min(|a|,|b|) elements and reads primitive
  *    slots, while the HOF fold null-propagates (zip_with pads a ragged
  *    pair with NULL; a NULL element NULLs its product and then the whole
  *    sum). Whenever lengths differ or a NULL element exists the fold
  *    yields NULL — so the rewrite guards on exactly those conditions and
  *    short-circuits to a NULL literal, never a truncated dot.
  *  - Only `Multiply(Cast(x AS DOUBLE), Cast(y AS DOUBLE))` bodies match:
  *    a float-typed multiply (no casts) rounds each product to float and
  *    is NOT bit-equal to the double fold — left untouched.
  *  - Only bare [[AttributeReference]] inputs match, so the guard's extra
  *    references never re-evaluate a computed subexpression.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(zip: ZipWith,
            Literal(zero, DoubleType), merge: LambdaFunction,
            finish: LambdaFunction)
          if zero == 0.0d &&
            isFloatArrayAttr(zip.left) && isFloatArrayAttr(zip.right) &&
            isCastMultiplyOfArgs(zip.function) &&
            isAddOfArgs(merge) && isIdentity(finish) =>
        val a = zip.left; val b = zip.right
        val guards = Seq(
          EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false))) ++
          Seq(a, b).collect {
            case e if e.dataType.asInstanceOf[ArrayType].containsNull =>
              Not(existsNullElement(e))
          }
        If(guards.reduce(And), DotProductFloat(a, b),
          Literal(null, DoubleType))
    }

  private def isFloatArrayAttr(e: Expression): Boolean = e match {
    case _: AttributeReference => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  /** body is `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)` over exactly the
    * lambda's own two arguments (either order). */
  private def isCastMultiplyOfArgs(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
          Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** merge is a plain `acc + v` of the lambda's own two arguments. */
  private def isAddOfArgs(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  /** `exists(arr, x -> x IS NULL)` built post-analysis (fresh resolved
    * lambda variable). */
  private def existsNullElement(arr: Expression): Expression = {
    val x = NamedLambdaVariable("x", FloatType, nullable = true,
      NamedExpression.newExprId, new AtomicReference[Any]())
    ArrayExists(arr, LambdaFunction(IsNull(x), Seq(x)))
  }
}
