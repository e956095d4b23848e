package sqloptspark;

import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Or;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * Base class for rules whose rewrite is only sound where NULL and FALSE
 * are indistinguishable: leaves of the And/Or spine of a Filter condition.
 *
 * Why the restriction exists (round-6 review finding): a rewrite like
 * {@code x = x → IsNotNull(x)} maps NULL to FALSE.  A WHERE clause keeps
 * only TRUE rows, and And/Or are monotone under the NULL→FALSE collapse,
 * so the substitution is safe anywhere reachable from the filter root
 * through And/Or alone.  Under anything else it is NOT: with nullable x,
 * {@code WHERE NOT (x = x)} keeps no rows (the inner predicate is TRUE or
 * NULL, so NOT yields FALSE or NULL), but {@code WHERE NOT isnotnull(x)}
 * keeps every null-x row — a live wrong-results bug the earlier
 * transformDown-everywhere version of GraftMarkerRule actually had.
 * Subclasses therefore only see spine leaves; NOT / CASE / comparison
 * arguments are never offered for rewriting.
 */
public abstract class NullRejectingFilterRule extends Rule<LogicalPlan> {

    /** Replacement for a spine leaf, or null when the shape doesn't apply. */
    protected abstract Expression rewriteLeaf(Expression e);

    /** Counter hook: one successful leaf rewrite. */
    protected void onRewrite() {}

    /** Counter hook: one optimizer invocation. */
    protected void onApply() {}

    private Expression rewriteSpine(Expression e) {
        if (e instanceof And) {
            And a = (And) e;
            Expression l = rewriteSpine(a.left());
            Expression r = rewriteSpine(a.right());
            return (l == a.left() && r == a.right()) ? e : new And(l, r);
        }
        if (e instanceof Or) {
            Or o = (Or) e;
            Expression l = rewriteSpine(o.left());
            Expression r = rewriteSpine(o.right());
            return (l == o.left() && r == o.right()) ? e : new Or(l, r);
        }
        Expression out = rewriteLeaf(e);
        if (out != null) {
            onRewrite();
            return out;
        }
        return e;
    }

    private final AbstractPartialFunction<LogicalPlan, LogicalPlan> planRule =
            new AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
                @Override
                public boolean isDefinedAt(LogicalPlan p) {
                    return p instanceof Filter;
                }

                @Override
                public LogicalPlan apply(LogicalPlan p) {
                    Filter f = (Filter) p;
                    Expression cond = rewriteSpine(f.condition());
                    // reference-equal when nothing fired: return the
                    // original node so the fixed-point batch stabilizes
                    if (cond == f.condition()) {
                        return p;
                    }
                    return new Filter(cond, f.child());
                }
            };

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        onApply();
        return (LogicalPlan) plan.transformDown(planRule);
    }
}
