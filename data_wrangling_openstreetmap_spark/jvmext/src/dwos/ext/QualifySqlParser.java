package dwos.ext;

import java.util.regex.Matcher;
import java.util.regex.Pattern;
import org.apache.spark.sql.catalyst.FunctionIdentifier;
import org.apache.spark.sql.catalyst.TableIdentifier;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.parser.ParseException;
import org.apache.spark.sql.catalyst.parser.ParserInterface;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;

/**
 * Delegating ParserInterface that lowers a trailing QUALIFY clause
 *
 *   SELECT ... FROM ... QUALIFY ROW_NUMBER()|RANK()|DENSE_RANK()
 *     OVER (...) <= N
 *
 * into standard Spark SQL before handing the text to the session's
 * real parser:
 *
 *   SELECT * EXCEPT (__qualify_rn) FROM (
 *     SELECT __q.*, <fn>() OVER (...) AS __qualify_rn
 *     FROM ( <original prefix> ) AS __q
 *   ) AS __qq WHERE __qualify_rn <= N
 *
 * The QUALIFY keyword is recognized only at the statement's TOP paren
 * level and outside quoted strings, so subqueries and literals that
 * merely contain the word pass through untouched; any text that does
 * not match the full documented shape is delegated unchanged (never a
 * silent partial lowering). Documented restriction (inherent to a
 * schema-free rewrite): the window expression may reference only
 * columns that appear in the statement's select list -- the window
 * computes over the prefix query's OUTPUT (__q.*), exactly like the
 * long-form subquery a user would write by hand. Scale: pure parse-time sugar -- the
 * rewritten window/filter plan is exactly what a hand-written
 * subquery produces, so pushdown, partitioning, and WindowGroupLimit
 * all behave as if the user had typed the long form.
 */
public class QualifySqlParser implements ParserInterface {

  private final ParserInterface delegate;

  public QualifySqlParser(ParserInterface delegate) {
    this.delegate = delegate;
  }

  private static final Pattern TAIL_HEAD = Pattern.compile(
      "(?is)^\\s*(ROW_NUMBER|RANK|DENSE_RANK)\\s*\\(\\s*\\)\\s+OVER\\s*\\(");

  private static final Pattern TAIL_REST = Pattern.compile(
      "(?s)^\\s*<=\\s*(\\d+)\\s*;?\\s*$");

  /** Index of the word QUALIFY at paren depth 0 outside quotes, or -1. */
  static int topLevelQualify(String sql) {
    int depth = 0;
    char quote = 0;
    for (int i = 0; i < sql.length(); i++) {
      char c = sql.charAt(i);
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < sql.length() && sql.charAt(i + 1) == quote) i++;
          else quote = 0;
        }
        continue;
      }
      if (c == '\'' || c == '"' || c == '`') { quote = c; continue; }
      if (c == '(') depth++;
      else if (c == ')') depth--;
      else if (depth == 0 && (c == 'q' || c == 'Q')
          && sql.regionMatches(true, i, "QUALIFY", 0, 7)
          && (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))
              && sql.charAt(i - 1) != '_')
          && (i + 7 >= sql.length()
              || !Character.isLetterOrDigit(sql.charAt(i + 7))
              && sql.charAt(i + 7) != '_')) {
        return i;
      }
    }
    return -1;
  }

  /** Index of the ')' matching the '(' at openIdx, or -1 --
   *  quote-aware, like topLevelQualify: parens inside string
   *  literals (and doubled-quote escapes) don't count (review r5: an
   *  OVER clause like date_format(ts, '(yyyy)') mis-balanced the
   *  scan and a supported statement silently delegated unrewritten). */
  static int matchParen(String s, int openIdx) {
    int depth = 0;
    char quote = 0;
    for (int i = openIdx; i < s.length(); i++) {
      char c = s.charAt(i);
      if (quote != 0) {
        if (c == quote) {
          if (i + 1 < s.length() && s.charAt(i + 1) == quote) i++;
          else quote = 0;
        }
        continue;
      }
      if (c == '\'' || c == '"' || c == '`') { quote = c; continue; }
      if (c == '(') depth++;
      else if (c == ')' && --depth == 0) return i;
    }
    return -1;
  }

  /** Lowered text, or null when the statement is not a QUALIFY form. */
  static String rewrite(String sql) {
    int idx = topLevelQualify(sql);
    if (idx < 0) return null;
    String prefix = sql.substring(0, idx).trim();
    if (!prefix.regionMatches(true, 0, "SELECT", 0, 6)) return null;
    String tail = sql.substring(idx + 7);
    Matcher head = TAIL_HEAD.matcher(tail);
    if (!head.find()) return null;
    int open = head.end() - 1;
    int close = matchParen(tail, open);
    if (close < 0) return null;
    Matcher rest = TAIL_REST.matcher(tail.substring(close + 1));
    if (!rest.matches()) return null;
    String fn = head.group(1).toUpperCase();
    String over = tail.substring(open + 1, close);
    String n = rest.group(1);
    return "SELECT * EXCEPT (__qualify_rn) FROM (SELECT __q.*, " + fn
        + "() OVER (" + over + ") AS __qualify_rn FROM (" + prefix
        + ") AS __q) AS __qq WHERE __qualify_rn <= " + n;
  }

  private String maybeRewrite(String sqlText) {
    String lowered = rewrite(sqlText);
    return lowered != null ? lowered : sqlText;
  }

  @Override
  public LogicalPlan parsePlan(String sqlText) throws ParseException {
    return delegate.parsePlan(maybeRewrite(sqlText));
  }

  @Override
  public LogicalPlan parseQuery(String sqlText) throws ParseException {
    return delegate.parseQuery(maybeRewrite(sqlText));
  }

  @Override
  public Expression parseExpression(String sqlText) throws ParseException {
    return delegate.parseExpression(sqlText);
  }

  @Override
  public TableIdentifier parseTableIdentifier(String sqlText) throws ParseException {
    return delegate.parseTableIdentifier(sqlText);
  }

  @Override
  public FunctionIdentifier parseFunctionIdentifier(String sqlText) throws ParseException {
    return delegate.parseFunctionIdentifier(sqlText);
  }

  @Override
  public scala.collection.immutable.Seq<String> parseMultipartIdentifier(
      String sqlText) throws ParseException {
    return delegate.parseMultipartIdentifier(sqlText);
  }

  @Override
  public StructType parseRoutineParam(String sqlText) throws ParseException {
    return delegate.parseRoutineParam(sqlText);
  }

  @Override
  public StructType parseTableSchema(String sqlText) throws ParseException {
    return delegate.parseTableSchema(sqlText);
  }

  @Override
  public DataType parseDataType(String sqlText) throws ParseException {
    return delegate.parseDataType(sqlText);
  }
}
