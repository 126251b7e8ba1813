package graft.plans;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Column <-> Expression bridge. Spark 4's helpers
 * (org.apache.spark.sql.classic.ExpressionUtils) are {@code private[sql]}
 * in Scala but public in bytecode; calling from Java is the supported-in-
 * practice route for libraries that add custom Catalyst expressions.
 */
public final class ColumnBridge {
    private ColumnBridge() {}

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
