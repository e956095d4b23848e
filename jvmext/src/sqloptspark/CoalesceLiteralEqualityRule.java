package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.expressions.Coalesce;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Literal;

/**
 * Third injected optimizer rule: rewrites the null-defaulting equality
 * idiom
 *
 *   coalesce(x, L1) = L2      (and the flipped literal-first form)
 *
 * into {@code x = L2} when L1 and L2 are non-null literals with DIFFERENT
 * values.  Proof of equivalence in a null-rejecting position: for x
 * non-null both sides are {@code x = L2}; for x null the original is
 * {@code L1 = L2} = FALSE while the rewrite is NULL — identical under a
 * WHERE/ON clause, which is exactly the contract
 * {@link NullRejectingFilterRule} enforces (the rewrite is NOT offered
 * under NOT/CASE, where FALSE and NULL diverge).  When L1 equals L2 the
 * predicate means {@code x = L2 OR x IS NULL} and is left alone.
 *
 * Why it matters: ETL code ported from engines with ifnull/nvl idioms
 * writes {@code WHERE coalesce(status, 'NONE') = 'ACTIVE'} constantly.
 * Catalyst evaluates the coalesce per row and pushes NOTHING to the
 * scan; after the rewrite the plan pushes {@code IsNotNull(status),
 * EqualTo(status, 'ACTIVE')} into the parquet reader, where row-group
 * min/max statistics skip non-matching data — at 100 TB the difference
 * between scanning the column and skipping most of the table.
 *
 * Same javac-only interop pattern as the sibling rules.
 */
public class CoalesceLiteralEqualityRule extends NullRejectingFilterRule {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    /** Number of coalesce-literal equalities rewritten. */
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
        if (!(e instanceof EqualTo)) {
            return null;
        }
        EqualTo eq = (EqualTo) e;
        Coalesce co;
        Literal lit;
        if (eq.left() instanceof Coalesce && eq.right() instanceof Literal) {
            co = (Coalesce) eq.left();
            lit = (Literal) eq.right();
        } else if (eq.right() instanceof Coalesce && eq.left() instanceof Literal) {
            co = (Coalesce) eq.right();
            lit = (Literal) eq.left();
        } else {
            return null;
        }
        if (co.children().size() != 2) {
            return null;
        }
        Expression first = (Expression) co.children().apply(0);
        if (!(co.children().apply(1) instanceof Literal)) {
            return null;
        }
        Literal dflt = (Literal) co.children().apply(1);
        if (dflt.value() == null || lit.value() == null) {
            return null;
        }
        // same default => `x = L2 OR x IS NULL`, a different predicate
        if (dflt.semanticEquals(lit)) {
            return null;
        }
        return new EqualTo(first, lit);
    }

    /** py4j-friendly static accessors. */
    public static long applied() {
        return APPLIED.get();
    }

    public static long rewritten() {
        return REWRITTEN.get();
    }
}
