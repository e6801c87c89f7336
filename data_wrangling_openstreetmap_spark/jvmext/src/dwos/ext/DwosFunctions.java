package dwos.ext;

import org.apache.spark.sql.catalyst.FunctionIdentifier;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Multiply;
import org.apache.spark.sql.catalyst.expressions.Round;
import org.apache.spark.sql.types.DataTypes;
import scala.collection.immutable.Seq;
import scala.runtime.AbstractFunction1;

/**
 * Catalyst-level SQL functions injected via
 * SparkSessionExtensions.injectFunction -- resolution-time MACROS
 * built from existing expression nodes, so they cost nothing at
 * runtime (whole-stage codegen sees only Multiply/Round/Cast).
 *
 * dwos_cents(x): the engine-wide exact-money recipe
 * CAST(round(x * 100) AS BIGINT) as a first-class function -- the
 * SQL-surface twin of operators/_helpers.cents() (Python) and
 * oracle_cents() (DuckDB text), so all three layers share ONE
 * definition of "exact cents".
 */
public final class DwosFunctions {

  private DwosFunctions() {}

  static final FunctionIdentifier CENTS_ID = new FunctionIdentifier("dwos_cents");

  static final ExpressionInfo CENTS_INFO = new ExpressionInfo(
      DwosFunctions.class.getCanonicalName(),
      null,
      "dwos_cents",
      "dwos_cents(expr) - exact integer cents of a 2-decimal money double:"
          + " CAST(round(expr * 100) AS BIGINT).",
      "Examples:\n  > SELECT dwos_cents(12.34);\n   1234");

  static final class CentsBuilder
      extends AbstractFunction1<Seq<Expression>, Expression> {
    @Override
    public Expression apply(Seq<Expression> args) {
      if (args.length() != 1) {
        throw new IllegalArgumentException(
            "dwos_cents expects exactly 1 argument, got " + args.length());
      }
      Expression x = args.apply(0);
      Expression scaled = new Multiply(
          new Cast(x, DataTypes.DoubleType, scala.Option.empty()),
          Literal.create(100.0d, DataTypes.DoubleType));
      Expression rounded = new Round(
          scaled, Literal.create(0, DataTypes.IntegerType));
      return new Cast(
          rounded, DataTypes.LongType, scala.Option.empty());
    }
  }
}
