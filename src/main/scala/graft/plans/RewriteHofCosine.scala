package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the higher-order-function cosine pattern
  * (`CASE WHEN sqrt(Σa²)·sqrt(Σb²) = 0 THEN 0 ELSE Σaᵢbᵢ /
  * (sqrt(Σa²)·sqrt(Σb²))` built from `aggregate`/`zip_with`/
  * `transform`) and replace it with the fused codegen
  * [[CosineSimilarity]] expression — so cosine written declaratively
  * (e.g. through SQL or by a user composing built-ins the way
  * `VectorFunctions.cosine` does) still runs the 5-100× faster native
  * loop. Results are bit-identical: both evaluate per-element
  * float→double widening with sequential double accumulation.
  *
  * Injected by `Sessions.extensions` via `injectOptimizerRule`.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** Matches transform(base, x -> cast(x as double)) over array<float>
    * and returns the base array expression. */
  private def castToDouble(e: Expression): Option[Expression] = e match {
    case ArrayTransform(base, LambdaFunction(Cast(_, DoubleType, _, _), _, _))
        if base.dataType.isInstanceOf[ArrayType] &&
          base.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      Some(base)
    case _ => None
  }

  private def exprId(e: NamedExpression) = e.exprId

  /** Matches aggregate(castToDouble(x), 0.0, (acc, v) -> acc + v*v, id)
    * — the Σx² norm accumulator. Every variable is bound by exprId to
    * the lambda argument it must reference: the Add must combine the
    * accumulator (first lambda arg) with element² (second arg squared),
    * and the finish lambda must be the identity on its own argument —
    * otherwise a user lambda of the same *shape* but different meaning
    * (e.g. (acc, v) -> v + acc*acc) would be silently rewritten. */
  private def normSq(e: Expression): Option[Expression] = e match {
    case ArrayAggregate(td, zero,
        LambdaFunction(Add(acc: NamedExpression, Multiply(y1: NamedExpression, y2: NamedExpression, _), _),
          Seq(accArg: NamedExpression, elemArg: NamedExpression), _),
        LambdaFunction(fin: NamedExpression, Seq(finArg: NamedExpression), _))
        if isZero(zero) && exprId(acc) == exprId(accArg) &&
          exprId(y1) == exprId(elemArg) && exprId(y2) == exprId(elemArg) &&
          exprId(fin) == exprId(finArg) =>
      castToDouble(td)
    case _ => None
  }

  /** Matches aggregate(zip_with(castToDouble(a), castToDouble(b),
    * (x, y) -> x*y), 0.0, (acc, v) -> acc+v, id) — the Σaᵢbᵢ dot.
    * The zip_with Multiply must reference BOTH lambda arguments (x·y
    * in either order, never x·x), and the merge Add must be
    * accumulator + element. */
  private def dot(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(ta, tb, LambdaFunction(Multiply(m1: NamedExpression, m2: NamedExpression, _),
          Seq(x: NamedExpression, y: NamedExpression), _)),
        zero,
        LambdaFunction(Add(acc: NamedExpression, v: NamedExpression, _),
          Seq(accArg: NamedExpression, elemArg: NamedExpression), _),
        LambdaFunction(fin: NamedExpression, Seq(finArg: NamedExpression), _))
        if isZero(zero) &&
          Set(exprId(m1), exprId(m2)) == Set(exprId(x), exprId(y)) &&
          exprId(acc) == exprId(accArg) && exprId(v) == exprId(elemArg) &&
          exprId(fin) == exprId(finArg) =>
      for (a <- castToDouble(ta); b <- castToDouble(tb)) yield (a, b)
    case _ => None
  }

  private def denom(e: Expression): Option[(Expression, Expression)] = e match {
    case Multiply(Sqrt(na), Sqrt(nb), _) =>
      for (a <- normSq(na); b <- normSq(nb)) yield (a, b)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cw @ CaseWhen(Seq((EqualTo(d1, zeroCmp), zeroRes)), Some(Divide(dotE, d2, _)))
          if isZero(zeroCmp) && isZero(zeroRes) =>
        (denom(d1), denom(d2), dot(dotE)) match {
          case (Some((a1, b1)), Some((a2, b2)), Some((a3, b3)))
              if a1.semanticEquals(a2) && a1.semanticEquals(a3) &&
                b1.semanticEquals(b2) && b1.semanticEquals(b3) =>
            CosineSimilarity(a1, b1)
          case _ => cw
        }
    }
}
