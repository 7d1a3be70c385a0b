package graft.lineage

/** Dialect preprocessor, a Spark-first port of the reference's
  * HivePreprocessor (shared/HivePreprocessor.java:83-197) plus the
  * dialect shims SURVEY §7.3 calls out.
  *
  * - collects `set k=v;` statements and substitutes `${hiveconf:k}`
  *   recursively (HivePreprocessor.java:118-137);
  * - comments out statements Spark-SQL can't or shouldn't run for
  *   analysis: SET, ADD JAR/FILE, MSCK REPAIR (HivePreprocessor.java:86);
  * - rewrites 2-arg `max(a,b)`/`min(a,b)` (Hive test SQL, case 0002) to
  *   `greatest`/`least`;
  * - splits a script into statements on top-level `;`.
  */
object SqlPreprocessor {

  private val SetStmt = """(?is)^\s*set\s+([\w.:]+)\s*=\s*(.*?)\s*$""".r
  private val DropStmt = """(?is)^\s*(add\s+jar|add\s+file|msck\s+repair)\b.*""".r

  def splitStatements(script: String): Seq[String] = {
    // Split on ';' outside quotes/comments.
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inS = false; var inD = false; var inLineComment = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inLineComment) { if (c == '\n') inLineComment = false; sb.append(c) }
      else if (inS) { if (c == '\'') inS = false; sb.append(c) }
      else if (inD) { if (c == '"') inD = false; sb.append(c) }
      else c match {
        case '\'' => inS = true; sb.append(c)
        case '"' => inD = true; sb.append(c)
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          inLineComment = true; sb.append(c)
        case ';' => out += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Returns analyzable statements, with hiveconf vars substituted and
    * non-analyzable statements removed. */
  def preprocess(script: String): Seq[String] = {
    val stmts = splitStatements(script)
    val vars = scala.collection.mutable.Map[String, String]()
    val kept = Seq.newBuilder[String]
    stmts.foreach {
      case SetStmt(k, v) =>
        val key = k.stripPrefix("hiveconf:")
        vars(key) = substitute(v, vars.toMap)
      case DropStmt(_) => // comment-out equivalent
      case other =>
        kept += rewriteDialect(substitute(other, vars.toMap))
    }
    kept.result()
  }

  def substitute(sql: String, vars: Map[String, String]): String = {
    var cur = sql
    var changed = true
    var rounds = 0
    while (changed && rounds < 10) { // recursive like the reference
      changed = false
      vars.foreach { case (k, v) =>
        val token = "${hiveconf:" + k + "}"
        if (cur.contains(token)) { cur = cur.replace(token, v); changed = true }
      }
      rounds += 1
    }
    cur
  }

  /** Token-level dialect rewrites (SURVEY §7.3): the reference's grammar
    * accepts Teradata/T-SQL spellings (`SEL`, `TOP n` — Bingql.g4:967-969)
    * that Spark's parser doesn't; rewrite them to ANSI before parsing. */
  def rewriteDialect(sql: String): String = {
    // 2-arg max/min → greatest/least. A light regex is enough for the
    // reference corpus: max(ident, ident) with simple args. Quote-aware:
    // occurrences inside string literals / quoted identifiers survive.
    val twoArgMax = """(?i)\bmax\s*\(\s*([\w.`]+)\s*,\s*([\w.`]+)\s*\)""".r
    val twoArgMin = """(?i)\bmin\s*\(\s*([\w.`]+)\s*,\s*([\w.`]+)\s*\)""".r
    val s1 = replaceOutsideQuotes(sql, twoArgMax)(
      m => s"greatest(${m.group(1)}, ${m.group(2)})")
    val s2 = replaceOutsideQuotes(s1, twoArgMin)(
      m => s"least(${m.group(1)}, ${m.group(2)})")
    // Teradata SEL → SELECT (statement-leading only).
    val s3 = """(?is)^\s*sel\b""".r.replaceAllIn(s2, "SELECT")
    // T-SQL `SELECT TOP n ...` → `SELECT ... LIMIT n` (no existing LIMIT;
    // TOP binds to the outermost select, which is all the reference
    // grammar accepts at that position).
    val topRe = """(?is)^(\s*select\s+)top\s+(\d+)\s+(.*)$""".r
    // Only an actual LIMIT <n> clause suppresses the rewrite — a bare
    // substring test would mis-fire on e.g. a `limit_price` column or a
    // string literal, leaving unparseable TOP syntax that skip-routes.
    val limitClause = """(?is)\blimit\s+\d+\b""".r
    val s4 = s3 match {
      case topRe(head, n, rest) if limitClause.findFirstIn(rest).isEmpty =>
        s"$head$rest LIMIT $n"
      case other => other
    }
    rewriteQualify(rewriteUnnest(rewriteArrayCtor(rewritePrestoTypes(
      rewriteAtTimeZone(rewriteActivityCount(s4))))))
  }

  /** Spans of single-quoted string literals ('' escapes), double-quoted
    * strings, and backtick-quoted identifiers — the regions token-level
    * dialect rewrites must never touch. An unterminated quote runs to
    * end-of-text (conservative: better to under-rewrite than corrupt). */
  private def literalSpans(sql: String): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val start = i
        i += 1
        var closed = false
        while (i < sql.length && !closed) {
          if (sql.charAt(i) == c) {
            // '' inside a '-quoted literal is an escaped quote, not a close
            if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.toSeq
  }

  /** replaceAllIn, skipping any match that overlaps a quoted region. */
  private[lineage] def replaceOutsideQuotes(
      sql: String, re: scala.util.matching.Regex)(
      repl: scala.util.matching.Regex.Match => String): String = {
    val spans = literalSpans(sql)
    re.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (spans.exists(s => m.start < s._2 && m.end > s._1)) m.matched
        else repl(m)))
  }

  /** Teradata `ACTIVITY_COUNT` (Bingql.g4:1415-1434, expr_spec_func) —
    * the rows-affected-by-previous-statement register. The reference
    * parses it as a bare expression atom; Spark has no equivalent and
    * the surrounding statement would otherwise skip-route, dropping its
    * lineage. A constant `CAST(0 AS BIGINT)` keeps the statement
    * analyzable — the register's VALUE is procedural state no batch
    * engine can reproduce, but every column ref around it survives.
    * Quote-aware: the token inside a string literal or a backtick
    * identifier is data, not the register. */
  private[lineage] def rewriteActivityCount(sql: String): String =
    replaceOutsideQuotes(sql, """(?i)\bactivity_count\b""".r)(
      _ => "CAST(0 AS BIGINT)")

  /** Presto `expr AT TIME ZONE 'tz'` (Bingql.g4:980-982 timezone_expr,
    * applied at 1251 `expr timezone_expr`; the zone is always a string
    * literal) → `from_utc_timestamp(expr, 'tz')`, which Spark parses
    * and which preserves the operand's column lineage. The operand is
    * recovered textually: a balanced `(...)` call (with its function
    * name), a `TIMESTAMP '...'` / `DATE '...'` literal, or a trailing
    * [qualified] identifier — the shapes the reference grammar admits
    * at that precedence level. */
  private[lineage] def rewriteAtTimeZone(sql: String): String = {
    val re = """(?is)\bat\s+time\s+zone\s+('[^']*')""".r
    re.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val tz = m.group(1)
        var end = m.start
        while (end > 0 && sql.charAt(end - 1).isWhitespace) end -= 1
        var start = end
        if (start > 0 && sql.charAt(start - 1) == ')') {
          var depth = 0; var i = start - 1; var done = false
          while (i >= 0 && !done) {
            val c = sql.charAt(i)
            if (c == ')') depth += 1
            else if (c == '(') { depth -= 1; if (depth == 0) done = true }
            if (!done) i -= 1
          }
          start = math.max(i, 0)
          while (start > 0 && (isIdentChar(sql.charAt(start - 1)) ||
            sql.charAt(start - 1) == '.')) start -= 1
        } else if (start > 0 && sql.charAt(start - 1) == '\'') {
          var i = start - 2
          while (i >= 0 && sql.charAt(i) != '\'') i -= 1
          start = math.max(i, 0)
          // include a preceding TIMESTAMP/DATE type keyword
          var j = start
          while (j > 0 && sql.charAt(j - 1).isWhitespace) j -= 1
          var k = j
          while (k > 0 && isIdentChar(sql.charAt(k - 1))) k -= 1
          if (k < j && sql.substring(k, j).matches("(?i)timestamp|date")) start = k
        } else {
          while (start > 0 && (isIdentChar(sql.charAt(start - 1)) ||
            sql.charAt(start - 1) == '.' || sql.charAt(start - 1) == '`')) start -= 1
        }
        val operand = sql.substring(start, end).trim
        if (operand.isEmpty) sql
        else sql.substring(0, start) + s"from_utc_timestamp($operand, $tz)" +
          rewriteAtTimeZone(sql.substring(m.end))
    }
  }

  /** Split on top-level commas (not inside parens or angle brackets). */
  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '<') => depth += 1; sb.append(c)
      case c @ (')' | '>') => depth -= 1; sb.append(c)
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** One Presto type term → Spark: `ROW(name type, …)` → `STRUCT<name:
    * type, …>` (anonymous fields get col1..colN), `ARRAY(t)` →
    * `ARRAY<t>`, bare `VARCHAR` → `STRING`; recursive. */
  private def convertPrestoType(t0: String): String = {
    val t = t0.trim
    val rowRe = """(?is)^row\s*\((.*)\)$""".r
    val arrRe = """(?is)^array\s*\((.*)\)$""".r
    t match {
      case rowRe(inner) =>
        val fields = splitTopLevelCommas(inner).zipWithIndex.map { case (f, i) =>
          // "[name] type" — name is the leading identifier iff more follows
          // at top level; a bare type (e.g. BIGINT, ARRAY(…)) is anonymous.
          val m = """^([A-Za-z_][\w]*)\s+(.+)$""".r.findFirstMatchIn(f)
          m match {
            case Some(g) if !g.group(1).matches("(?i)row|array|map") =>
              s"${g.group(1)}: ${convertPrestoType(g.group(2))}"
            case _ => s"col${i + 1}: ${convertPrestoType(f)}"
          }
        }
        s"STRUCT<${fields.mkString(", ")}>"
      case arrRe(inner) => s"ARRAY<${convertPrestoType(inner)}>"
      case _ if t.equalsIgnoreCase("varchar") => "STRING"
      case other => other
    }
  }

  /** Presto type spellings in CAST targets (`ROW(...)` / `ARRAY(...)`,
    * Bingql.g4:526 array_dtypes "The Presto definition") → Spark
    * `STRUCT<…>` / `ARRAY<…>`. Only `AS ROW(`/`AS ARRAY(` cast positions
    * are rewritten — a value-level `array(…)` constructor call stays. */
  private[lineage] def rewritePrestoTypes(sql: String): String = {
    val re = """(?i)\bas\s+(row|array)\s*\(""".r
    re.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val i = matchBalanced(sql, m.end, '(', ')')
        if (i < 0) sql
        else {
          val typ = convertPrestoType(
            s"${m.group(1)}(${sql.substring(m.end, i - 1)})")
          sql.substring(0, m.start) + "AS " + typ + rewritePrestoTypes(sql.substring(i))
        }
    }
  }

  /** Index just past the bracket balancing the already-consumed `open`
    * (scan starts at depth 1), quote-aware; -1 if unbalanced. */
  private def matchBalanced(sql: String, from: Int, open: Char, close: Char): Int = {
    var depth = 1; var i = from
    var inS = false; var inD = false
    while (i < sql.length && depth > 0) {
      val c = sql.charAt(i)
      if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else if (c == '\'') inS = true
      else if (c == '"') inD = true
      else if (c == open) depth += 1
      else if (c == close) depth -= 1
      i += 1
    }
    if (depth == 0) i else -1
  }

  /** Presto `ARRAY[…]` constructor (Bingql.g4:526) → Spark `array(…)`.
    * Bracket-matched (nested `ARRAY[ARRAY[…]]` and indexing brackets
    * inside the body are handled), quote-aware. */
  private[lineage] def rewriteArrayCtor(sql: String): String = {
    val re = """(?i)\barray\s*\[""".r
    re.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val i = matchBalanced(sql, m.end, '[', ']')
        if (i < 0) sql
        else sql.substring(0, m.start) + "array(" +
          rewriteArrayCtor(sql.substring(m.end, i - 1)) + ")" +
          rewriteArrayCtor(sql.substring(i))
    }
  }

  /** Presto `CROSS JOIN UNNEST(arr) [AS] t (c)` (Bingql.g4:1046-1047) →
    * Hive/Spark `LATERAL VIEW explode(arr) t AS c` — same FROM-clause
    * position, so an in-place textual swap parses. Multi-column and
    * WITH ORDINALITY forms are left untouched (absent from the
    * reference corpus). */
  private[lineage] def rewriteUnnest(sql: String): String = {
    val re = """(?is)\bcross\s+join\s+unnest\s*\(""".r
    re.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val i = matchBalanced(sql, m.end, '(', ')')
        if (i < 0) return sql
        val arrExpr = sql.substring(m.end, i - 1)
        val after = sql.substring(i)
        val aliasRe = """(?is)^\s*(?:as\s+)?([\w`]+)\s*\(\s*([\w`]+)\s*\)""".r
        aliasRe.findFirstMatchIn(after) match {
          case Some(a) =>
            sql.substring(0, m.start) +
              s"LATERAL VIEW explode($arrExpr) ${a.group(1)} AS ${a.group(2)}" +
              rewriteUnnest(after.substring(a.end))
          case None => sql
        }
    }
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '$'

  /** First top-level occurrence of `word` — paren depth 0, outside
    * quotes/backticks/line comments, whole-word — at or after `from`;
    * -1 if absent. */
  private[lineage] def findTopLevel(sql: String, word: String, from: Int = 0): Int = {
    var i = from; var depth = 0
    var inS = false; var inD = false; var inB = false; var inC = false
    val n = sql.length; val wl = word.length
    while (i < n) {
      val c = sql.charAt(i)
      if (inC) { if (c == '\n') inC = false }
      else if (inS) { if (c == '\'') inS = false }
      else if (inD) { if (c == '"') inD = false }
      else if (inB) { if (c == '`') inB = false }
      else c match {
        case '\'' => inS = true
        case '"' => inD = true
        case '`' => inB = true
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' => inC = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && i + wl <= n &&
            sql.regionMatches(true, i, word, 0, wl) &&
            (i == 0 || !isIdentChar(sql.charAt(i - 1))) &&
            (i + wl == n || !isIdentChar(sql.charAt(i + wl))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Teradata `QUALIFY pred` (Bingql.g4:1110-1111) → an ANSI
    * window-subquery form Spark parses. Two shapes:
    *
    *  - predicate references select-list aliases (`QUALIFY rn = 1`):
    *    wrap the whole select and filter above it —
    *    `SELECT * FROM (SELECT <sel> FROM <rest>) __qualify_t
    *     WHERE (<pred>) [tail]`;
    *  - predicate contains inline window functions
    *    (`QUALIFY ROW_NUMBER() OVER (…) = 1`): compute it alongside the
    *    select list (window fns are legal there, illegal in WHERE) —
    *    `SELECT * EXCEPT (__qualify__) FROM (SELECT <sel>, (<pred>) AS
    *     __qualify__ FROM <rest>) __qualify_t WHERE __qualify__ [tail]`.
    *
    * Only a top-level QUALIFY is rewritten (the reference corpus never
    * nests it); the scan is quote/paren-aware so identifiers or
    * literals containing "qualify" don't trigger it. */
  private[lineage] def rewriteQualify(sql: String): String = {
    val qIdx = findTopLevel(sql, "qualify")
    if (qIdx < 0) return sql
    val selIdx = findTopLevel(sql, "select")
    val fromIdx = if (selIdx < 0) -1 else findTopLevel(sql, "from", selIdx)
    if (selIdx < 0 || fromIdx < 0 || fromIdx > qIdx) return sql
    val rest = sql.substring(qIdx + "qualify".length)
    // The predicate runs to the next top-level ORDER BY / LIMIT (or end).
    val tailIdx = Seq(findTopLevel(rest, "order"), findTopLevel(rest, "limit"))
      .filter(_ >= 0).minOption.getOrElse(rest.length)
    val pred = rest.substring(0, tailIdx).trim
    val tail = rest.substring(tailIdx).trim
    if (pred.isEmpty) return sql
    val prefix = sql.substring(0, selIdx) // e.g. INSERT OVERWRITE TABLE t
    val selectList = sql.substring(selIdx + "select".length, fromIdx).trim
    val fromPart = sql.substring(fromIdx, qIdx).trim
    val tailStr = if (tail.isEmpty) "" else " " + tail
    if ("""(?i)\bover\s*\(""".r.findFirstIn(pred).isDefined)
      s"""${prefix}SELECT * EXCEPT (__qualify__) FROM (
         |SELECT $selectList, ($pred) AS __qualify__ $fromPart
         |) __qualify_t WHERE __qualify__$tailStr""".stripMargin
    else
      s"""${prefix}SELECT * FROM (
         |SELECT $selectList $fromPart
         |) __qualify_t WHERE ($pred)$tailStr""".stripMargin
  }
}
