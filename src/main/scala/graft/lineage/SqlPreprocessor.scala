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
    // reference corpus: max(ident, ident) with simple args.
    val twoArgMax = """(?i)\bmax\s*\(\s*([\w.`]+)\s*,\s*([\w.`]+)\s*\)""".r
    val twoArgMin = """(?i)\bmin\s*\(\s*([\w.`]+)\s*,\s*([\w.`]+)\s*\)""".r
    val s1 = twoArgMax.replaceAllIn(sql, m => s"greatest(${m.group(1)}, ${m.group(2)})")
    val s2 = twoArgMin.replaceAllIn(s1, m => s"least(${m.group(1)}, ${m.group(2)})")
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
    s3 match {
      case topRe(head, n, rest) if limitClause.findFirstIn(rest).isEmpty =>
        s"$head$rest LIMIT $n"
      case other => other
    }
  }
}
