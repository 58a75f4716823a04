package graft.queries

import org.apache.spark.sql.types.{LongType, StructType}

/** Mechanical enforcement of the ORACLE TYPING RULE (Registry.scala):
  * DuckDB types a raw integer `sum(...)` as HUGEINT (int128) while Spark
  * emits BIGINT, and the driver's hash diverges on the type tag even when
  * every value is bit-identical. Two consecutive rounds lost a red row to
  * this class (r10 `expr_to_number`, r11 `pipe_skyline`) — so the rule is
  * now a lint, not prose.
  *
  * For every declared query whose SPARK result schema exposes a
  * [[LongType]] column, the oracle SQL is scanned for `sum(...)`
  * aggregates aliased to that column name. Such an alias is a violation
  * unless either
  *   (a) the `sum(` is directly wrapped in a `CAST( ... )` — e.g.
  *       `CAST(sum(x) AS BIGINT)`, or
  *   (b) some later projection re-casts the column —
  *       `... AS BIGINT) AS <col>` appears anywhere in the oracle (the
  *       CTE may keep the raw sum as long as the exposed projection
  *       narrows it back to BIGINT).
  * `count(*)` is BIGINT on both engines and is not checked; sums that
  * feed only non-LongType outputs (DOUBLE ratios etc.) are invisible to
  * the lint because the Spark schema types them away.
  */
object OracleLint {

  /** Violation messages for one query; empty = clean. */
  def check(name: String, schema: StructType, oracle: String): Seq[String] = {
    val longCols =
      schema.fields.filter(_.dataType == LongType).map(_.name.toLowerCase).toSet
    if (longCols.isEmpty) return Nil
    val o = oracle.toLowerCase
    // identifier boundary after $col: without it, `... AS n` exempts a
    // DIFFERENT column named `n_rows` (substring false negative); the
    // optional `as` also accepts bare-identifier re-projections
    def recast(col: String): Boolean =
      ("as\\s+bigint\\s*\\)\\s+(as\\s+)?" + java.util.regex.Pattern.quote(col) +
        "(?![a-z0-9_])").r.findFirstIn(o).isDefined

    // every DuckDB aggregate that silently widens integers to HUGEINT:
    // sum (the class that bit twice), product, and list_sum
    val sumRe = "(?<![a-z0-9_])(sum|product|list_sum)\\s*\\(".r
    sumRe.findAllMatchIn(o).toSeq.flatMap { m =>
      val open = o.indexOf('(', m.start)
      closeOf(o, open) match {
        case None => Nil
        case Some(close) =>
          val directlyWrapped =
            o.substring(math.max(0, m.start - 8), m.start)
              .replaceAll("\\s+", "").endsWith("cast(")
          aliasAfter(o, close + 1) match {
            case Some(alias)
                if longCols(alias) && !directlyWrapped && !recast(alias) =>
              Seq(s"$name: oracle aliases a raw integer `sum(...)` to BIGINT " +
                s"output column `$alias` — DuckDB will type it HUGEINT and the " +
                "driver hash will diverge. Wrap it CAST(sum(...) AS BIGINT) or " +
                s"re-project `CAST($alias AS BIGINT) AS $alias` " +
                "(Registry.scala ORACLE TYPING RULE).")
            case _ => Nil
          }
      }
    }
  }

  /** Index of the `)` balancing the `(` at `open`, if any. */
  private def closeOf(s: String, open: Int): Option[Int] = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** SQL keywords that may legally follow an un-aliased aggregate — a
    * bare identifier here that is NOT one of these can only be an
    * AS-less alias (`sum(x) mon`), which must be linted like `AS mon`. */
  private val kw = Set(
    "from", "where", "group", "order", "having", "union", "except",
    "intersect", "limit", "offset", "fetch", "over", "filter", "and",
    "or", "not", "is", "in", "between", "like", "then", "else", "end",
    "when", "on", "join", "inner", "left", "right", "full", "cross",
    "using", "qualify", "window", "asc", "desc", "as",
    "nulls", "ignore", "respect")

  /** The alias following position `from` — `AS <ident>` or a bare
    * non-keyword identifier (`sum(x) mon`) — skipping an optional
    * `FILTER (WHERE ...)` clause. None when the sum feeds a larger
    * expression (`sum(x) / n`, `) + 1`, ...) — those are typed by the
    * enclosing expression, not the bare sum. */
  private def aliasAfter(s: String, from: Int): Option[String] = {
    var j = from
    def skipWs(): Unit = { while (j < s.length && s.charAt(j).isWhitespace) j += 1 }
    def ident(): Option[String] = {
      val start = j
      while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
      if (j > start) Some(s.substring(start, j)) else None
    }
    skipWs()
    if (s.startsWith("filter", j)) {
      j += 6; skipWs()
      if (j < s.length && s.charAt(j) == '(') closeOf(s, j) match {
        case Some(c) => j = c + 1; skipWs()
        case None => return None
      }
    }
    ident() match {
      case Some("as") =>
        skipWs()
        ident()
      case Some(bare) if !kw(bare) => Some(bare) // AS-less alias
      case _ => None
    }
  }
}
