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
public class DwosSqlParser implements ParserInterface {

  private final ParserInterface delegate;

  public DwosSqlParser(ParserInterface delegate) {
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

  /** Index of `word` at paren depth 0 outside quotes (word-bounded),
   *  searching from `from`; -1 if absent. lastMatch=true returns the
   *  LAST such occurrence. */
  static int topLevelWord(String sql, String word, boolean lastMatch) {
    int depth = 0;
    char quote = 0;
    int found = -1;
    int n = word.length();
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
      else if (depth == 0
          && Character.toUpperCase(c) == Character.toUpperCase(word.charAt(0))
          && sql.regionMatches(true, i, word, 0, n)
          && (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))
              && sql.charAt(i - 1) != '_')
          && (i + n >= sql.length()
              || !Character.isLetterOrDigit(sql.charAt(i + n))
              && sql.charAt(i + n) != '_')) {
        if (!lastMatch) return i;
        found = i;
      }
    }
    return found;
  }

  // ---------------------------------------------------------------
  // DISTINCT ON -> row_number()=1 rewrite (schema-free)
  //
  //   SELECT DISTINCT ON (<cols>) <sel> FROM <rest> ORDER BY <order>
  //
  // lowers to
  //
  //   SELECT <sel> FROM (
  //     SELECT *, ROW_NUMBER() OVER (
  //       PARTITION BY <cols> ORDER BY <order>) AS __don_rn
  //     FROM <rest>
  //   ) __dq WHERE __don_rn = 1
  //
  // (<rest> may carry its own WHERE/GROUP BY clauses -- the star
  // select wraps them without needing an alias placement.)
  //
  // -- keep the FIRST row per key group under the statement's ORDER
  // BY (the Postgres/DuckDB semantics). Documented restrictions: the
  // select list must be plain columns of the FROM relation, and the
  // statement must end with the ORDER BY clause.
  // ---------------------------------------------------------------

  private static final Pattern DON_HEAD = Pattern.compile(
      "(?is)^\\s*SELECT\\s+DISTINCT\\s+ON\\s*\\(");

  static String rewriteDistinctOn(String sql) {
    Matcher h = DON_HEAD.matcher(sql);
    if (!h.find()) return null;
    int close = matchParen(sql, h.end() - 1);
    if (close < 0) return null;
    String cols = sql.substring(h.end(), close);
    String afterCols = sql.substring(close + 1);
    int fromIdx = topLevelWord(afterCols, "FROM", false);
    if (fromIdx < 0) return null;
    String sel = afterCols.substring(0, fromIdx).trim();
    String tail = afterCols.substring(fromIdx + 4);
    int obIdx = topLevelWord(tail, "ORDER", true);
    if (obIdx < 0) return null;
    Matcher ob = Pattern.compile("(?is)^ORDER\\s+BY\\s+").matcher(
        tail.substring(obIdx));
    if (!ob.find()) return null;
    String rest = tail.substring(0, obIdx).trim();
    String order = tail.substring(obIdx + ob.end()).replaceAll(";\\s*$", "").trim();
    if (sel.isEmpty() || rest.isEmpty() || order.isEmpty()) return null;
    return "SELECT " + sel + " FROM (SELECT *, ROW_NUMBER() OVER ("
        + "PARTITION BY " + cols + " ORDER BY " + order
        + ") AS __don_rn FROM " + rest + ") __dq WHERE __don_rn = 1";
  }

  // ---------------------------------------------------------------
  // * EXCLUDE (cols) -> * EXCEPT (cols) rewrite (token-level)
  //
  // DuckDB/Snowflake spell star-minus-columns EXCLUDE; Spark 4 spells
  // it EXCEPT. The shapes are otherwise identical, so the lowering is
  // a pure token substitution wherever the word EXCLUDE (outside
  // quoted strings, word-bounded) directly follows a PROJECTION star
  // and is directly followed by `(` -- valid at ANY paren depth, so it
  // works inside subqueries and composes with the other rewrites (it
  // runs as a pre-pass). A projection star is one preceded by `.`
  // (alias.*), `(`, `,`, or the keyword SELECT -- so `price *
  // exclude(qty)` (multiplication by a function named exclude) never
  // matches. The string scanner also honors backslash escapes inside
  // '...'/"..." literals (Spark supports them; `...` identifiers
  // don't).
  // ---------------------------------------------------------------

  /** True when the `*` at starIdx is a projection star, not the
   *  multiplication operator. */
  static boolean isProjectionStar(String sql, int starIdx) {
    int q = starIdx - 1;
    if (q >= 0 && sql.charAt(q) == '.') return true;  // alias.*
    while (q >= 0 && Character.isWhitespace(sql.charAt(q))) q--;
    if (q < 0) return false;  // bare leading '*' is not a statement
    char pc = sql.charAt(q);
    if (pc == '(' || pc == ',') return true;
    int end = q + 1;
    while (q >= 0 && (Character.isLetterOrDigit(sql.charAt(q))
        || sql.charAt(q) == '_')) q--;
    return sql.regionMatches(true, q + 1, "SELECT", 0, 6)
        && end - (q + 1) == 6;
  }

  static String rewriteExclude(String sql) {
    StringBuilder out = null;
    char quote = 0;
    int last = 0;
    for (int i = 0; i < sql.length(); i++) {
      char c = sql.charAt(i);
      if (quote != 0) {
        if (c == '\\' && (quote == '\'' || quote == '"')
            && i + 1 < sql.length()) { i++; continue; }
        if (c == quote) {
          if (i + 1 < sql.length() && sql.charAt(i + 1) == quote) i++;
          else quote = 0;
        }
        continue;
      }
      if (c == '\'' || c == '"' || c == '`') { quote = c; continue; }
      if ((c == 'e' || c == 'E')
          && sql.regionMatches(true, i, "EXCLUDE", 0, 7)
          && (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))
              && sql.charAt(i - 1) != '_')
          && (i + 7 >= sql.length()
              || !Character.isLetterOrDigit(sql.charAt(i + 7))
              && sql.charAt(i + 7) != '_')) {
        int p = i - 1;
        while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p--;
        int n = i + 7;
        while (n < sql.length() && Character.isWhitespace(sql.charAt(n))) n++;
        if (p >= 0 && sql.charAt(p) == '*' && isProjectionStar(sql, p)
            && n < sql.length() && sql.charAt(n) == '(') {
          if (out == null) out = new StringBuilder();
          out.append(sql, last, i).append("EXCEPT");
          last = i + 7;
          i = n - 1;  // resume at the '(' (no depth tracking needed)
        }
      }
    }
    if (out == null) return null;
    out.append(sql, last, sql.length());
    return out.toString();
  }

  private String maybeRewrite(String sqlText) {
    String pre = rewriteExclude(sqlText);
    if (pre != null) sqlText = pre;
    String lowered = rewriteAsof(sqlText);
    if (lowered == null) lowered = rewrite(sqlText);
    if (lowered == null) lowered = rewriteDistinctOn(sqlText);
    return lowered != null ? lowered : sqlText;
  }

  // ---------------------------------------------------------------
  // ASOF [LEFT] JOIN -> LATERAL rewrite (schema-free)
  //
  //   FROM <left> a ASOF [LEFT] JOIN <right> b
  //     ON a.k = b.k [AND ...] AND a.ts >= b.ts
  //
  // lowers to
  //
  //   FROM <left> a [LEFT] JOIN LATERAL (
  //     SELECT * FROM <right> __r
  //     WHERE __r.k = a.k [AND ...] AND __r.ts <= a.ts
  //     ORDER BY __r.ts DESC LIMIT 1
  //   ) b ON TRUE
  //
  // which Spark decorrelates to the WindowGroupLimit rank-1 plan --
  // one shuffle on the key, no schema resolution needed at parse
  // time (only the ON clause's column NAMES are read). Among right
  // rows tied on (k, ts) the winner is engine-chosen, exactly like a
  // native as-of join. Any text not matching the documented shape
  // delegates unchanged.
  // ---------------------------------------------------------------

  private static final Pattern ASOF_JOIN_HEAD = Pattern.compile(
      "(?is)^\\s*(LEFT\\s+)?JOIN\\s+");

  private static final Pattern ASOF_RIGHT_NAMED = Pattern.compile(
      "^\\s*([A-Za-z_][\\w.]*)");

  private static final Pattern ASOF_ALIAS_ON = Pattern.compile(
      "(?is)^\\s+(?:AS\\s+)?([A-Za-z_]\\w*)\\s+ON\\s+");

  private static final Pattern ASOF_EQ = Pattern.compile(
      "(?s)^\\s*([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)\\s*=\\s*"
          + "([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)\\s*$");

  private static final Pattern ASOF_RANGE = Pattern.compile(
      "(?s)^\\s*([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)\\s*(>=|<=)\\s*"
          + "([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)\\s*;?\\s*$");

  /** Index of the word ASOF at paren depth 0 outside quotes, or -1. */
  static int topLevelAsof(String sql) {
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
      else if (depth == 0 && (c == 'a' || c == 'A')
          && sql.regionMatches(true, i, "ASOF", 0, 4)
          && (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))
              && sql.charAt(i - 1) != '_')
          && (i + 4 >= sql.length()
              || !Character.isLetterOrDigit(sql.charAt(i + 4))
              && sql.charAt(i + 4) != '_')) {
        return i;
      }
    }
    return -1;
  }

  /** Lowered text, or null when the statement is not an ASOF form. */
  static String rewriteAsof(String sql) {
    int idx = topLevelAsof(sql);
    if (idx < 0) return null;
    String prefix = sql.substring(0, idx);
    if (!prefix.trim().regionMatches(true, 0, "SELECT", 0, 6)) return null;
    String tail = sql.substring(idx + 4);
    Matcher jm = ASOF_JOIN_HEAD.matcher(tail);
    if (!jm.find()) return null;
    boolean left = jm.group(1) != null;
    int pos = jm.end();
    String right;
    if (pos < tail.length() && tail.charAt(pos) == '(') {
      int close = matchParen(tail.substring(pos), 0);
      if (close < 0) return null;
      right = tail.substring(pos, pos + close + 1);
      pos += close + 1;
    } else {
      Matcher rm = ASOF_RIGHT_NAMED.matcher(tail.substring(pos));
      if (!rm.find()) return null;
      right = rm.group(1);
      pos += rm.end();
    }
    Matcher am = ASOF_ALIAS_ON.matcher(tail.substring(pos));
    if (!am.find()) return null;
    String balias = am.group(1);
    String conds = tail.substring(pos + am.end());
    String[] parts = conds.split("(?i)\\s+AND\\s+");
    if (parts.length < 2) return null;
    StringBuilder where = new StringBuilder();
    String orderCol = null;
    for (int i = 0; i < parts.length; i++) {
      boolean last = i == parts.length - 1;
      Matcher m = (last ? ASOF_RANGE : ASOF_EQ).matcher(parts[i]);
      if (!m.matches()) return null;
      String la = m.group(1), lc = m.group(2);
      String op = last ? m.group(3) : "=";
      String ra = m.group(last ? 4 : 3), rc = m.group(last ? 5 : 4);
      String lhs, rhs;
      if (ra.equalsIgnoreCase(balias) && !la.equalsIgnoreCase(balias)) {
        lhs = la + "." + lc; rhs = "__r." + rc;
      } else if (la.equalsIgnoreCase(balias) && !ra.equalsIgnoreCase(balias)) {
        lhs = ra + "." + rc; rhs = "__r." + lc;
        op = op.equals(">=") ? "<=" : op.equals("<=") ? ">=" : op;
      } else {
        return null;  // both or neither side is the right alias
      }
      if (last) {
        // normalize to __r.ts <= left.ts (backward as-of)
        if (!op.equals(">=")) return null;  // left.ts >= __r.ts
        where.append("__r.").append(rhs.startsWith("__r.")
            ? rhs.substring(4) : rhs).append(" <= ").append(lhs);
        orderCol = rhs.startsWith("__r.") ? rhs.substring(4) : rhs;
      } else {
        where.append(rhs).append(" = ").append(lhs).append(" AND ");
      }
    }
    if (orderCol == null) return null;
    return prefix + (left ? "LEFT JOIN LATERAL (SELECT * FROM "
                          : "JOIN LATERAL (SELECT * FROM ")
        + right + " __r WHERE " + where
        + " ORDER BY __r." + orderCol + " DESC LIMIT 1) " + balias
        + " ON TRUE";
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
