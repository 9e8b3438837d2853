package graft.functions

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule for the graft native functions: algebraic identities
  * Catalyst can't see on its own (constant folding stops at opaque
  * expressions it has no rewrite for).
  *
  *   graft_sqdist(x, x)  →  0.0        (null-preserving)
  *
  * For every non-null, NaN-free x — empty arrays and null ELEMENTS
  * included (the kernel skips them pairwise) — Σ(xᵢ−xᵢ)² is exactly
  * 0.0; a null ARRAY yields null (BinaryExpression's null-intolerant
  * default), preserved via If/IsNull. The one exception is NaN:
  * NaN−NaN = NaN, so sqdist(x, x) = NaN ≠ 0.0 for a vector carrying
  * NaN. The rule therefore fires only under
  * `spark.graft.sqdist.selfFoldNaNSafe` (default true; set false when
  * vectors may carry NaN) — the embedding tables this library targets
  * are NaN-free by construction, and the conf documents that
  * assumption instead of hiding it.
  *
  * Deliberately NOT folded: graft_cosine(x, x) is 1.0 only for
  * non-zero-norm x (all-zeros → 0/0 = NaN), and
  * graft_sorted_intersect_count(x, x) is size-minus-nulls, neither of
  * which is a safe blanket identity.
  */
object SelfDistanceFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = conf.getConfString("spark.graft.sqdist.selfFoldNaNSafe", "true") == "true"
    if (!enabled) plan
    else plan.transformAllExpressions {
      case SqDist(a, b) if a.semanticEquals(b) && a.deterministic =>
        if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(0.0))
        else Literal(0.0)
    }
  }
}
