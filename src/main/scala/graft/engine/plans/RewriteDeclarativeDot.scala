package graft.engine.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.engine.expr.NativeFunctions.LongArrayDot

/** Optimizer rule: recognize the declarative BIGINT dot product
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` and
  * rewrite it to the codegen'd [[LongArrayDot]].
  *
  * The declarative form is the portable spec users naturally write
  * (Similarity.qdotDeclarative), but it executes as interpreted lambda
  * dispatch per element — ~10× slower per pair in ANN/near-dup loops.
  * With this rule (installed via [[graft.GraftExtensions]]), the
  * spec form gets native speed with no API change.
  *
  * Soundness: fires only on ArrayType(LongType, containsNull=false)
  * inputs. `zip_with` null-pads unequal lengths, making the declarative
  * result NULL, while LongArrayDot truncates to the shorter array — so
  * the rewrite emits `if (size(a) = size(b)) dot(a, b) else NULL`, which
  * also yields NULL when either array is NULL (null comparison → else
  * branch, and the O(1) guard keeps everything in one codegen span).
  * Arithmetic mode: accepted in any EvalMode — the native loop wraps on
  * BIGINT overflow where ANSI would raise, matching the engine-wide
  * wrapping contract of [[LongArrayDot]] (all quantized inputs are
  * overflow-safe by construction: |q| ≤ ~2000 per component).
  */
object RewriteDeclarativeDot extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, arg: NamedExpression): Boolean =
    (e, arg) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
      case _ => false
    }

  /** The two operands are exactly the lambda's two variables, either order
    * (multiplication and addition commute).
    */
  private def usesBoth(l: Expression, r: Expression,
                       args: Seq[NamedExpression]): Boolean =
    args.length == 2 &&
      ((sameVar(l, args(0)) && sameVar(r, args(1))) ||
        (sameVar(l, args(1)) && sameVar(r, args(0))))

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zargs, _)),
            Literal(0L, LongType),
            LambdaFunction(Add(al, ar, _), margs, _),
            LambdaFunction(fin, fargs, _))
          if longArrayNoNulls(a) && longArrayNoNulls(b) &&
            usesBoth(x, y, zargs) && usesBoth(al, ar, margs) &&
            fargs.length == 1 && sameVar(fin, fargs.head) =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          LongArrayDot(a, b), Literal(null, LongType))
    }
}
