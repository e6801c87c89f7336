package dwos.ext;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.parser.ParserInterface;
import scala.runtime.AbstractFunction1;
import scala.runtime.AbstractFunction2;
import scala.runtime.BoxedUnit;

/**
 * spark.sql.extensions entry point: injects DwosSqlParser in front
 * of Spark's SQL parser, adding a QUALIFY clause (the Snowflake /
 * DuckDB / BigQuery window-filter surface) to every spark.sql() call
 * in the session -- the Catalyst-level half of SURVEY section 4.2,
 * whose pre-parse string-rewrite frontend (plans/sql_ext.py) remains
 * the fallback for sessions built without the jar.
 *
 * Usage:
 *   spark.driver.extraClassPath=<path>/dwos-sql-ext.jar
 *   spark.sql.extensions=dwos.ext.DwosSqlExtensions
 */
public class DwosSqlExtensions
    extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectParser(
        new AbstractFunction2<SparkSession, ParserInterface, ParserInterface>() {
          @Override
          public ParserInterface apply(
              SparkSession session, ParserInterface delegate) {
            return new DwosSqlParser(delegate);
          }
        });
    // Catalyst FUNCTION injection (the second section 4.2 extension point):
    // dwos_cents -- the exact-money macro, resolved into plain
    // Multiply/Round/Cast nodes at analysis time.
    extensions.injectFunction(
        new scala.Tuple3<>(
            DwosFunctions.CENTS_ID,
            DwosFunctions.CENTS_INFO,
            new DwosFunctions.CentsBuilder()));
    return BoxedUnit.UNIT;
  }
}
