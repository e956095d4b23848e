package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.IsNotNull;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * A Catalyst optimizer rule injected JVM-side via spark.sql.extensions —
 * the Spark-native analog of the reference's rewrite-rule pipeline
 * (engine/src/query_rewriter.cpp:7-22, a chain of rewrite passes applied
 * to every query before execution).
 *
 * The rule performs a rewrite Catalyst itself does not: a trivial
 * self-equality predicate {@code x = x} on a NULLABLE column is
 * equivalent to {@code x IS NOT NULL} (SQL equality is null-rejecting),
 * but SimplifyBinaryComparison only folds it for non-nullable inputs and
 * InferFiltersFromConstraints merely ADDS an inferred isnotnull next to
 * it — the per-row self-comparison survives in the optimized plan.  This
 * rule replaces it, which both removes the residual comparison and turns
 * the predicate into a parquet-pushable IsNotNull.  The spirit matches
 * the reference's trivial-predicate removal (1=1 dropping,
 * sqlopt.cpp:673-688) one notch beyond what Catalyst already covers.
 *
 * Counters let tests observe the rule running inside the optimizer.
 * Compiled with plain javac against the pyspark-shipped jars (no Scala
 * toolchain in the environment): Scala interop goes through
 * AbstractPartialFunction, overriding isDefinedAt + apply so the trait's
 * applyOrElse default dispatches to them.  See jvmext/README.md and
 * tests/test_extensions.py.
 */
public class GraftMarkerRule extends Rule<LogicalPlan> {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    /** Number of x = x predicates rewritten to IsNotNull(x). */
    public static final AtomicLong REWRITTEN = new AtomicLong();

    /** The operand of a deterministic self-equality, else null. */
    private static Expression selfEquality(Expression e) {
        if (e instanceof EqualTo) {
            EqualTo eq = (EqualTo) e;
            if (eq.left().deterministic() && eq.left().semanticEquals(eq.right())) {
                return eq.left();
            }
        }
        return null;
    }

    /** Same one-slot per-thread memo as PrefixEqualityRule: applyOrElse
     *  probes isDefinedAt then apply on the same node. */
    private static final ThreadLocal<Object[]> MEMO =
            ThreadLocal.withInitial(() -> new Object[2]);

    private static Expression memoized(Expression e) {
        Object[] m = MEMO.get();
        if (m[0] != e) {
            m[0] = e;
            m[1] = selfEquality(e);
        }
        return (Expression) m[1];
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
                    return new IsNotNull(memoized(e));
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
                    // reference-equal when nothing fired: return the original
                    // node so the fixed-point batch sees a stable plan
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
