package sqloptspark;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * Entry point for spark.sql.extensions: a Function1[SparkSessionExtensions,
 * Unit] that registers {@link GraftMarkerRule} as an operator-optimization
 * rule.  AbstractFunction1 supplies the Scala Function1 plumbing so plain
 * javac suffices.
 *
 * Usage:
 *   SparkSession.builder
 *     .config("spark.driver.extraClassPath", "<path to graft-ext.jar>")
 *     .config("spark.sql.extensions", "sqloptspark.GraftExtensions")
 */
public class GraftExtensions
        extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

    /** Builds the rule for each new session (injectOptimizerRule contract). */
    public static class Builder
            extends AbstractFunction1<SparkSession, Rule<LogicalPlan>> {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new GraftMarkerRule();
        }
    }

    /** Builder for the substring-prefix-equality → StartsWith rule. */
    public static class PrefixBuilder
            extends AbstractFunction1<SparkSession, Rule<LogicalPlan>> {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new PrefixEqualityRule();
        }
    }

    /** Builder for the coalesce-literal-equality → bare equality rule. */
    public static class CoalesceBuilder
            extends AbstractFunction1<SparkSession, Rule<LogicalPlan>> {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new CoalesceLiteralEqualityRule();
        }
    }

    /** Builder for the length-vs-zero → empty-string equality rule. */
    public static class EmptyLengthBuilder
            extends AbstractFunction1<SparkSession, Rule<LogicalPlan>> {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new EmptyStringLengthRule();
        }
    }

    @Override
    public BoxedUnit apply(SparkSessionExtensions extensions) {
        extensions.injectOptimizerRule(new Builder());
        extensions.injectOptimizerRule(new PrefixBuilder());
        extensions.injectOptimizerRule(new CoalesceBuilder());
        extensions.injectOptimizerRule(new EmptyLengthBuilder());
        return BoxedUnit.UNIT;
    }
}
