package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.IsNotNull;

/**
 * A Catalyst optimizer rule injected JVM-side via spark.sql.extensions —
 * the Spark-native analog of the reference's rewrite-rule pipeline
 * (engine/src/query_rewriter.cpp:7-22, a chain of rewrite passes applied
 * to every query before execution).
 *
 * The rule performs a rewrite Catalyst itself does not: a trivial
 * self-equality predicate {@code x = x} on a NULLABLE column is
 * equivalent to {@code x IS NOT NULL} in a WHERE clause (SQL equality is
 * null-rejecting), but SimplifyBinaryComparison only folds it for
 * non-nullable inputs and InferFiltersFromConstraints merely ADDS an
 * inferred isnotnull next to it — the per-row self-comparison survives in
 * the optimized plan.  This rule replaces it, which both removes the
 * residual comparison and turns the predicate into a parquet-pushable
 * IsNotNull.  The spirit matches the reference's trivial-predicate
 * removal (1=1 dropping, sqlopt.cpp:673-688) one notch beyond what
 * Catalyst already covers.
 *
 * The equivalence maps NULL to FALSE, so it holds only in null-rejecting
 * positions — hence {@link NullRejectingFilterRule}, which offers this
 * rule only And/Or-spine leaves of Filter conditions.  (Round-6 review
 * fix: the previous transformDown-everywhere version returned null-x rows
 * for {@code WHERE NOT (x = x)}, whose correct answer is no rows.)
 *
 * Counters let tests observe the rule running inside the optimizer.
 * Compiled with plain javac against the pyspark-shipped jars (no Scala
 * toolchain in the environment); see jvmext/README.md and
 * tests/test_extensions.py.
 */
public class GraftMarkerRule extends NullRejectingFilterRule {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    /** Number of x = x predicates rewritten to IsNotNull(x). */
    public static final AtomicLong REWRITTEN = new AtomicLong();

    @Override
    protected void onApply() {
        APPLIED.incrementAndGet();
    }

    @Override
    protected void onRewrite() {
        REWRITTEN.incrementAndGet();
    }

    @Override
    protected Expression rewriteLeaf(Expression e) {
        if (e instanceof EqualTo) {
            EqualTo eq = (EqualTo) e;
            if (eq.left().deterministic() && eq.left().semanticEquals(eq.right())) {
                return new IsNotNull(eq.left());
            }
        }
        return null;
    }

    /** py4j-friendly static accessors. */
    public static long applied() {
        return APPLIED.get();
    }

    public static long rewritten() {
        return REWRITTEN.get();
    }
}
