package sqloptspark;

import java.util.concurrent.atomic.AtomicLong;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * A Catalyst optimizer rule injected JVM-side via spark.sql.extensions —
 * the Spark-native analog of the reference's rewrite-rule pipeline
 * (engine/src/query_rewriter.cpp:7-22, a chain of rewrite passes applied
 * to every query before execution).
 *
 * The Python package performs its rewrites declaratively (Catalyst already
 * implements pushdown/pruning/decorrelation, SURVEY §2.10), so this rule
 * intentionally transforms nothing: it proves the extension point — the
 * engine can ship JVM rules that run inside the optimizer on every query —
 * and counts its invocations so tests can observe it ran.  Compiled with
 * plain javac against the pyspark-shipped jars (no Scala toolchain in the
 * environment); see jvmext/README.md and tests/test_extensions.py.
 */
public class GraftMarkerRule extends Rule<LogicalPlan> {

    /** Number of times the optimizer invoked this rule (across sessions). */
    public static final AtomicLong APPLIED = new AtomicLong();

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        APPLIED.incrementAndGet();
        return plan;
    }

    /** py4j-friendly static accessor. */
    public static long applied() {
        return APPLIED.get();
    }
}
