package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Length;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Literal$;
import org.apache.spark.sql.catalyst.expressions.Not;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.StringType;
import scala.runtime.AbstractPartialFunction;

/**
 * Fourth injected optimizer rule: rewrites the empty-string length idioms
 *
 *   length(x) = 0      (and 0 = length(x))        →  x = ''
 *   length(x) &gt; 0   (0 &lt; length(x),
 *   length(x) &gt;= 1, 1 &lt;= length(x))          →  NOT (x = '')
 *
 * for a STRING-typed x.  Both directions are NULL-faithful — length(NULL)
 * is NULL exactly where NULL = '' is NULL — so unlike the x = x and
 * coalesce rules this rewrite is sound ANYWHERE in a predicate, including
 * under NOT; it is still applied only inside Filter conditions because
 * that is where it buys pushdown (same placement as the substring rule).
 *
 * Why it matters: length() evaluates per row and pushes nothing to the
 * source; the rewritten EqualTo pushes to parquet as EqualTo(x, "") —
 * row groups whose min &gt; '' skip without decoding — and the negated
 * form pushes as Not(EqualTo).  The idiom is everywhere in data-cleaning
 * SQL ported from engines that index length ("WHERE length(trim_col) = 0"
 * written as a blank test).  Catalyst has no such simplification.
 *
 * Same javac-only interop pattern as GraftMarkerRule (see its javadoc).
 */
public class EmptyStringLengthRule extends Rule<LogicalPlan> {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    /** Number of length-vs-zero comparisons rewritten. */
    public static final AtomicLong REWRITTEN = new AtomicLong();

    private static boolean isStringLength(Expression e) {
        if (!(e instanceof Length)) {
            return false;
        }
        Object dt = ((Length) e).child().dataType();
        // Spark 4 collated strings are StringType instances too; under a
        // trailing-space-insensitive collation (e.g. UTF8_BINARY_RTRIM)
        // x = '' is TRUE for x = '  ' while length(x) = 0 is FALSE, so
        // the rewrite is only sound for the default binary collation.
        return dt instanceof StringType
                && ((StringType) dt).isUTF8BinaryCollation();
    }

    private static boolean isIntLit(Expression e, int want) {
        if (!(e instanceof Literal)) {
            return false;
        }
        Object v = ((Literal) e).value();
        return v instanceof Integer && (Integer) v == want;
    }

    private static Expression emptyEquality(Expression lengthSide) {
        Expression x = ((Length) lengthSide).child();
        return new EqualTo(x, (Literal) Literal$.MODULE$.apply(""));
    }

    /** The equivalent empty-string test, or null when the shape differs. */
    private static Expression asEmptyTest(Expression e) {
        // length(x) = 0  |  0 = length(x)   ->   x = ''
        if (e instanceof EqualTo) {
            EqualTo eq = (EqualTo) e;
            if (isStringLength(eq.left()) && isIntLit(eq.right(), 0)) {
                return emptyEquality(eq.left());
            }
            if (isStringLength(eq.right()) && isIntLit(eq.left(), 0)) {
                return emptyEquality(eq.right());
            }
            return null;
        }
        // length(x) > 0  |  0 < length(x)   ->   NOT (x = '')
        if (e instanceof GreaterThan) {
            GreaterThan gt = (GreaterThan) e;
            if (isStringLength(gt.left()) && isIntLit(gt.right(), 0)) {
                return new Not(emptyEquality(gt.left()));
            }
            return null;
        }
        if (e instanceof LessThan) {
            LessThan lt = (LessThan) e;
            if (isStringLength(lt.right()) && isIntLit(lt.left(), 0)) {
                return new Not(emptyEquality(lt.right()));
            }
            return null;
        }
        // length(x) >= 1  |  1 <= length(x)   ->   NOT (x = '')
        if (e instanceof GreaterThanOrEqual) {
            GreaterThanOrEqual ge = (GreaterThanOrEqual) e;
            if (isStringLength(ge.left()) && isIntLit(ge.right(), 1)) {
                return new Not(emptyEquality(ge.left()));
            }
            return null;
        }
        if (e instanceof LessThanOrEqual) {
            LessThanOrEqual le = (LessThanOrEqual) e;
            if (isStringLength(le.right()) && isIntLit(le.left(), 1)) {
                return new Not(emptyEquality(le.right()));
            }
            return null;
        }
        return null;
    }

    /** Same per-thread one-slot memo as PrefixEqualityRule (see there). */
    private static final ThreadLocal<Expression[]> MEMO =
            ThreadLocal.withInitial(() -> new Expression[2]);

    private static Expression memoized(Expression e) {
        Expression[] m = MEMO.get();
        if (m[0] != e) {
            m[0] = e;
            m[1] = asEmptyTest(e);
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
