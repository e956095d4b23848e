package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.StartsWith;
import org.apache.spark.sql.catalyst.expressions.Substring;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.StringType;
import scala.runtime.AbstractPartialFunction;

/**
 * Second injected optimizer rule (same extension point as
 * {@link GraftMarkerRule}): rewrites the prefix-test idiom
 *
 *   substring(x, 1, n) = 'lit'      (and the flipped literal-first form)
 *
 * into {@code StartsWith(x, 'lit')} when the literal is a non-null string
 * of EXACTLY n characters.  The forms are equivalent there: Spark's
 * substring truncates at the end of the string, so the equality holds iff
 * x has at least n chars and they match the literal — which is precisely
 * startswith; both are null iff x is null.  (If the literal is shorter
 * than n, the predicate instead pins the total length of x — NOT a
 * prefix test — so the rule leaves it alone.  n &lt;= 0 likewise.)
 *
 * Why it matters: Catalyst simplifies LIKE 'abc%' to StartsWith
 * (LikeSimplification) but has no rule for the substring spelling, which
 * is how the predicate is typically written when ported from engines
 * without LIKE-pushdown (e.g. substr(ship_date, 1, 4) = '2024').  A
 * Substring equality evaluates per row and pushes nothing; StartsWith
 * pushes to parquet as StringStartsWith, skipping row groups whose
 * min/max exclude the prefix — at 100 TB that is the difference between
 * scanning the column and skipping most of the table.
 *
 * Same javac-only interop pattern as GraftMarkerRule (see its javadoc).
 */
public class PrefixEqualityRule extends Rule<LogicalPlan> {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    /** Number of substring-prefix equalities rewritten to StartsWith. */
    public static final AtomicLong REWRITTEN = new AtomicLong();

    /** The equivalent StartsWith, or null when the shape doesn't apply. */
    private static Expression asStartsWith(Expression e) {
        if (!(e instanceof EqualTo)) {
            return null;
        }
        EqualTo eq = (EqualTo) e;
        Substring sub;
        Literal lit;
        if (eq.left() instanceof Substring && eq.right() instanceof Literal) {
            sub = (Substring) eq.left();
            lit = (Literal) eq.right();
        } else if (eq.right() instanceof Substring && eq.left() instanceof Literal) {
            sub = (Substring) eq.right();
            lit = (Literal) eq.left();
        } else {
            return null;
        }
        if (!(lit.dataType() instanceof StringType) || lit.value() == null) {
            return null;
        }
        if (!(sub.str().dataType() instanceof StringType)) {
            return null;
        }
        if (!(sub.pos() instanceof Literal) || !(sub.len() instanceof Literal)) {
            return null;
        }
        Object pos = ((Literal) sub.pos()).value();
        Object len = ((Literal) sub.len()).value();
        if (!(pos instanceof Integer) || !(len instanceof Integer)) {
            return null;
        }
        if ((Integer) pos != 1 || (Integer) len <= 0) {
            return null;
        }
        // avoid UTF8String methods (its interface drags kryo onto the
        // compile classpath); code-point count == substring's char count
        String v = lit.value().toString();
        if (v.codePointCount(0, v.length()) != (Integer) len) {
            return null;
        }
        return new StartsWith(sub.str(), lit);
    }

    /**
     * applyOrElse calls isDefinedAt then apply on the same node, and the
     * optimizer re-runs the rule every fixed-point iteration — a
     * per-thread one-slot memo avoids recomputing (and re-allocating)
     * the rewrite twice per matching node.  ThreadLocal because rules
     * run concurrently across sessions.
     */
    private static final ThreadLocal<Expression[]> MEMO =
            ThreadLocal.withInitial(() -> new Expression[2]);

    private static Expression memoized(Expression e) {
        Expression[] m = MEMO.get();
        if (m[0] != e) {
            m[0] = e;
            m[1] = asStartsWith(e);
        }
        return m[1];
    }

    private static final AbstractPartialFunction<Expression, Expression> EXPR_RULE =
            new AbstractPartialFunction<Expression, Expression>() {
                @Override
                public boolean isDefinedAt(Expression e) {
                    return memoized(e) != null;
                }

                @Override
                public Expression apply(Expression e) {
                    REWRITTEN.incrementAndGet();
                    return memoized(e);
                }
            };

    private static final AbstractPartialFunction<LogicalPlan, LogicalPlan> PLAN_RULE =
            new AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
                @Override
                public boolean isDefinedAt(LogicalPlan p) {
                    return p instanceof Filter;
                }

                @Override
                public LogicalPlan apply(LogicalPlan p) {
                    Filter f = (Filter) p;
                    Expression cond = (Expression) f.condition().transformDown(EXPR_RULE);
                    if (cond == f.condition()) {
                        return p;
                    }
                    return new Filter(cond, f.child());
                }
            };

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        APPLIED.incrementAndGet();
        return (LogicalPlan) plan.transformDown(PLAN_RULE);
    }

    /** py4j-friendly static accessors. */
    public static long applied() {
        return APPLIED.get();
    }

    public static long rewritten() {
        return REWRITTEN.get();
    }
}
