package graft.lineage

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Ports the boolean assertions of the reference's validate_NNNN.sql
  * (sql_lineage/test_cases/) against our walker output — the same
  * golden-property style, minus the MySQL detour. */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def edges(caseId: String) =
    LineageRunner.run(spark, graft.operators.LineageQueries.scripts(caseId)).edges

  test("0001: SELECT * expands to 4 passthrough columns") {
    val es = edges("0001").map(_._2)
    assert(es.size == 4)
    assert(es.forall(e => e.context == "SELECT" && e.parentTable == "tab10"))
    assert(es.map(_.outColumn).toSet ==
      Set("col100l", "col101s", "col102b", "col103i"))
  }

  test("0002: max(col103i, col303i) has exactly the two arg parents (validate_0002)") {
    val es = edges("0002").map(_._2)
    val maxParents = es.filter(e => e.outColumn == "max_int" && e.context == "SELECT")
      .map(e => s"${e.parentSchema}.${e.parentTable}.${e.parentColumn}").toSet
    assert(maxParents == Set("dw.tab10.col103i", "stage.tab30.col303i"))
  }

  test("0005: union positional merge - col1 has 3 parents, col3 has 2 (validate_0005)") {
    val es = edges("0005").map(_._2)
    assert(es.count(_.outColumn == "col100l") == 3)
    assert(es.count(_.outColumn == "col102b") == 2) // NULL literal branch contributes none
  }

  test("0004: lateral view column parents include the exploded source column (validate_0004)") {
    val es = edges("0004").map(_._2)
    assert(es.exists(e => e.outColumn == "id" && e.parentColumn == "col402x"))
  }

  test("0009: multi-table insert routes lineage per target (validate_0009)") {
    val res = LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0009"))
    val t1 = res.edges.filter(_._1 == "dw.dest_table_1").map(_._2)
    val t2 = res.edges.filter(_._1 == "dw.dest_table_2").map(_._2)
    // 2-hop through the CTE: dest_table_1.col101s <- dw.tab10.col101s
    assert(t1.exists(e => e.outColumn == "col101s" &&
      e.parentTable == "tab10" && e.parentColumn == "col101s"))
    assert(t2.exists(e => e.outColumn == "yn_flag" && e.parentColumn == "col102b"))
    assert(res.inserts.map(_.insertType).sorted ==
      Seq("INSERT INTO TABLE", "INSERT INTO TABLE", "INSERT OVERWRITE TABLE"))
  }

  test("0006: count(*) produces the $COL_ASTERISK$ proxy scoped to its block (validate_0006)") {
    val es = edges("0006").map(_._2)
    val proxies = es.filter(_.parentColumn == LineageWalker.Asterisk)
    assert(proxies.nonEmpty)
    assert(proxies.forall(e => e.parentTable == "tab40")) // not the outer tab10
  }

  test("0001: select_item name/definition/data_type pass-through (validate_0001:2-12)") {
    val items = LineageRunner.run(spark,
      graft.operators.LineageQueries.scripts("0001")).items.map(_._2)
    val sel = items.filter(_.usageContext == "SELECT")
    assert(sel.size == 4) // si_cnt_match
    // col_type_match: name = definition, data_type propagated per column
    val expect = Map("col100l" -> "BIGINT", "col101s" -> "STRING",
      "col102b" -> "BOOLEAN", "col103i" -> "INT")
    expect.foreach { case (name, dt) =>
      assert(sel.exists(i => i.name == name && i.definition == name &&
        i.dataType == dt && i.isSimpleColumn &&
        i.mapToSchema == "dw" && i.mapToTable == "tab10" && i.mapToColumn == name),
        s"missing pass-through item $name:$dt")
    }
  }

  test("0002: select_item aliases, function_type and predicate items (validate_0002)") {
    val items = LineageRunner.run(spark,
      graft.operators.LineageQueries.scripts("0002")).items.map(_._2)
    val maxItem = items.find(_.name == "max_int").get
    assert(maxItem.functionType == "SCALAR" && !maxItem.isSimpleColumn &&
      maxItem.alias == "max_int")
    val ynFlag = items.find(_.name == "yn_flag").get
    assert(ynFlag.isSimpleColumn && ynFlag.definition == "col102b" &&
      ynFlag.dataType == "BOOLEAN" && ynFlag.mapToColumn == "col102b")
    assert(items.count(_.usageContext == "JOIN") == 3)
    assert(items.count(_.usageContext == "WHERE") == 2)
  }

  test("0004: count(1) is an AGGREGATION select_item") {
    val items = LineageRunner.run(spark,
      graft.operators.LineageQueries.scripts("0004")).items.map(_._2)
    assert(items.exists(i => i.name == "cnt" && i.functionType == "AGGREGATION"))
  }

  test("column closure: col_dummy reaches dw.tab10.col100l at distance 2 (validate_0002-style)") {
    import spark.implicits._
    val res = LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0010"))
    val colEdges = res.edges.collect {
      case (tgt, e) if tgt.nonEmpty =>
        (s"$tgt.${e.outColumn}", s"${e.parentSchema}.${e.parentTable}.${e.parentColumn}")
    }.distinct.toDF("child", "parent")
    val closed = Closure.close(colEdges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(closed.contains(
      ("default.conforming_case_1.col_dummy", "dw.tab10.col100l", 2)))
  }

  test("preprocessor: hiveconf substitution and statement handling") {
    val out = SqlPreprocessor.preprocess(
      """set hiveconf:tbl=dw.tab10;
        |add jar /tmp/x.jar;
        |SELECT * FROM ${hiveconf:tbl};""".stripMargin)
    assert(out == Seq("SELECT * FROM dw.tab10"))
  }

  test("preprocessor: 2-arg max rewrites to greatest, aggregates untouched") {
    assert(SqlPreprocessor.rewriteDialect("select max(a, b), max(x) from t")
      == "select greatest(a, b), max(x) from t")
  }

  test("0003: create+insert — single insert, trace col401s→tab40_str, 5 TABLE datasets (validate_0003)") {
    val res = LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0003"))
    // validate_0003: `count(1)=1 fnd_table_create from table_insert`
    assert(res.inserts.size == 1)
    assert(res.inserts.head.dbSchema == "adhoc" &&
      res.inserts.head.dbTable == "created_tab_0")
    // validate_0003 lineage_ok: the 3-level select_item_rel trace from
    // physical col401s through intermediate tab40_str to the top level —
    // in our flattened edge model: the insert target's tab40_str output
    // resolves to exactly adhoc.tab40.col401s in SELECT context.
    val tgt = res.edges.filter(_._1 == "adhoc.created_tab_0").map(_._2)
    assert(tgt.filter(e => e.outColumn == "tab40_str" && e.context == "SELECT")
      .map(e => s"${e.parentSchema}.${e.parentTable}.${e.parentColumn}").toSet ==
      Set("adhoc.tab40.col401s"))
    // validate_0003 confirm_insert: max_int / yn_flag / col101s select
    // items attached to the insert's dataset.
    val insertItems = res.items.filter(_._1 == "adhoc.created_tab_0").map(_._2.name).toSet
    assert(Set("max_int", "yn_flag", "col101s").subsetOf(insertItems))
    // validate_0003 ds_cnt_match: 5 TABLE datasets in the store — the 4
    // physical sources plus the created target.
    val srcTables = res.edges.map(e => s"${e._2.parentSchema}.${e._2.parentTable}").toSet
    assert((srcTables + "adhoc.created_tab_0").size == 5)
  }

  test("0007: fv_col has exactly 2 JOIN + 2 SELECT + 2 WHERE parents (validate_0007)") {
    val byCtx = edges("0007").map(_._2)
      .filter(_.outColumn == "fv_col")
      .groupBy(_.context).view.mapValues(_.size).toMap
    assert(byCtx == Map("JOIN" -> 2, "SELECT" -> 2, "WHERE" -> 2))
  }

  test("0008: tc1 parents are col100l, col101s, col200l (validate_0008; contexts per SURVEY §7.4.2)") {
    // The reference's group-by fan-out records all three with
    // usage_context SELECT (join keys leak into SELECT context); we
    // deliberately keep join keys in JOIN context (SURVEY §7.4.2) —
    // same parent set, honest contexts.
    val tc1 = edges("0008").map(_._2).filter(_.outColumn == "tc1")
    assert(tc1.map(e => (e.parentTable, e.parentColumn, e.context)).toSet == Set(
      ("tab10", "col101s", "SELECT"),
      ("tab10", "col100l", "JOIN"),
      ("tab20", "col200l", "JOIN")))
  }

  test("parallel batch extraction produces a byte-identical store vs sequential") {
    val sqlDir = "/tmp/graft_batch_par_sql"
    val seqStore = "/tmp/graft_batch_par_seq"
    val parStore = "/tmp/graft_batch_par_par"
    val d = new java.io.File(sqlDir)
    d.mkdirs()
    d.listFiles().foreach(_.delete())
    graft.operators.LineageQueries.scripts.foreach { case (id, sql) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$sqlDir/$id.sql"), sql)
    }
    val (okSeq, skipSeq) = BatchRunner.run(spark, sqlDir, seqStore)
    val (okPar, skipPar) = BatchRunner.run(spark, sqlDir, parStore, numParallel = 3)
    assert(skipSeq.isEmpty && skipPar.isEmpty)
    assert(okSeq.map(new java.io.File(_).getName) == okPar.map(new java.io.File(_).getName))
    val tables = Seq("sql_source", "dataset", "select_item", "select_item_rel",
      "table_insert", "table_add_partition", "dashboard_dataset")
    okSeq.foreach { f =>
      val name = new java.io.File(f).getName.stripSuffix(".sql")
      tables.foreach { t =>
        val a = spark.read.parquet(s"$seqStore/$name/$t")
        val b = spark.read.parquet(s"$parStore/$name/$t")
        val rows = (df: org.apache.spark.sql.DataFrame) =>
          df.collect().map(_.toString).sorted.toSeq
        assert(rows(a) == rows(b), s"$name/$t differs between sequential and parallel")
      }
    }
  }

  test("side tables: symlink-aware closure reaches the alias, dashboard columns derived") {
    import spark.implicits._
    val edges = Seq(("a.t1", "b.t2"), ("b.t2", "c.t3")).toDF("child", "parent")
    SideTables.writeSymlinks(spark,
      Seq(("c", "t3", "c", "t3_latest", "LatestOperator", "s3://x", "")),
      "/tmp/graft_sidespec_sym")
    val closed = SideTables.closeWithSymlinks(
        edges, spark.read.parquet("/tmp/graft_sidespec_sym"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(closed.contains(("a.t1", "c.t3", 2)))
    assert(closed.contains(("a.t1", "c.t3_latest", 3))) // through the symlink
    assert(!closed.exists { case (c, p, _) => c == p }) // no alias self-lineage
    // but GENUINE self-lineage on a non-aliased table survives
    val selfLoop = Seq(("x.t", "x.t"), ("x.t", "b.t2")).toDF("child", "parent")
    val closed2 = SideTables.closeWithSymlinks(
        selfLoop, spark.read.parquet("/tmp/graft_sidespec_sym"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(closed2.contains(("x.t", "x.t", 1)), "real self-loop was dropped")
    val res = LineageRunner.run(spark, "SELECT col100l FROM dw.tab10;")
    LineageStore.write(spark, "4242.sql", res, "/tmp/graft_sidespec_store",
      system = "dashboard")
    val cols = SideTables.dashboardLineage(spark, Seq("/tmp/graft_sidespec_store"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(cols.toSet == Set((4242L, "dw", "tab10", "col100l")))
  }

  test("closure: driver-BFS overflow falls back to distributed, same result") {
    import spark.implicits._
    // 60-node chain: closure is 59+58+…+1 = 1770 rows.
    val chain = (0 until 59).map(i => (s"n$i", s"n${i + 1}")).toDF("child", "parent")
    val full = Closure.close(chain, maxIters = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(full.size == 1770 && full.contains(("n0", "n59", 59)))
    // Cap the driver output at 100 rows: BFS aborts, distributed fixpoint
    // must produce the identical closure.
    val fellBack = Closure.close(chain, maxIters = 100, maxClosureRows = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(fellBack == full)
  }

  test("partition introspection: values with $, quote, backslash substitute safely") {
    spark.sql("CREATE DATABASE IF NOT EXISTS dw LOCATION 'file:///tmp/graft_wh/dw.db'")
    spark.sql("DROP TABLE IF EXISTS dw.part_esc")
    spark.sql(
      """CREATE TABLE dw.part_esc (v INT) USING parquet PARTITIONED BY (dt STRING)
        |LOCATION 'file:///tmp/graft_wh/dw/part_esc'""".stripMargin)
    val tricky = "z$1\\'s" // $-group ref, backslash, quote
    spark.sql("ALTER TABLE dw.part_esc ADD PARTITION (dt='a')")
    // Add the tricky partition through the catalog API to avoid DDL escaping.
    val cat = spark.sessionState.catalog
    val ti = org.apache.spark.sql.catalyst.TableIdentifier("part_esc", Some("dw"))
    cat.createPartitions(ti, Seq(
      org.apache.spark.sql.catalyst.catalog.CatalogTablePartition(
        Map("dt" -> tricky),
        cat.getTableMetadata(ti).storage)), ignoreIfExists = true)
    val out = PartitionIntrospect.expand(
      spark, "SELECT * FROM dw.part_esc WHERE dt = MAX_PART_STRING('dw.part_esc', 'dt')")
    // 'z$1\'s' > 'a' lexically, so the tricky value is the max.
    assert(out.contains("\\$1") == false) // no stray group-reference mangling
    val lit = out.split("= ", 2)(1)
    assert(spark.sql(s"SELECT $lit AS x").head.getString(0) == tricky)
  }

  test("preprocessor: QUALIFY alias form wraps into subquery + WHERE") {
    val out = SqlPreprocessor.rewriteDialect(
      "SELECT a, ROW_NUMBER() OVER (ORDER BY b) AS rn FROM t QUALIFY rn = 1 ORDER BY a")
    assert(out.toLowerCase.startsWith("select * from ("))
    assert(out.contains("WHERE (rn = 1) ORDER BY a"))
    assert(!out.toLowerCase.replace("__qualify_t", "").contains("qualify"))
  }

  test("preprocessor: QUALIFY inline-window form computes the predicate in the select") {
    val out = SqlPreprocessor.rewriteDialect(
      "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1")
    assert(out.contains("EXCEPT (__qualify__)"))
    assert(out.contains("AS __qualify__"))
    assert(out.contains("WHERE __qualify__"))
  }

  test("preprocessor: qualify-like identifiers and literals do not trigger the rewrite") {
    val sql = "SELECT qualify_flag, 'qualify this' AS s FROM disqualify_t"
    assert(SqlPreprocessor.rewriteDialect(sql) == sql)
  }

  test("preprocessor: ARRAY[...] rewrites to array(...), nested and indexed") {
    assert(SqlPreprocessor.rewriteArrayCtor("SELECT ARRAY[1, 2, x[3]] AS a")
      == "SELECT array(1, 2, x[3]) AS a")
    assert(SqlPreprocessor.rewriteArrayCtor("SELECT ARRAY[ARRAY[1], ARRAY[2]]")
      == "SELECT array(array(1), array(2))")
    // plain subscript untouched
    assert(SqlPreprocessor.rewriteArrayCtor("SELECT arr[1] FROM t")
      == "SELECT arr[1] FROM t")
  }

  test("preprocessor: Presto ROW/ARRAY cast types rewrite to STRUCT<>/ARRAY<>") {
    val out = SqlPreprocessor.rewriteDialect(
      "SELECT CAST(j AS ROW(id BIGINT, tags ARRAY(VARCHAR))) AS s FROM dw.tab10")
    assert(out.contains("AS STRUCT<id: BIGINT, tags: ARRAY<STRING>>"))
    // the rewritten statement parses and analyzes
    val res = LineageRunner.run(spark,
      "SELECT CAST(named_struct('id', col100l, 'tags', array(col101s)) " +
        "AS ROW(id BIGINT, tags ARRAY(VARCHAR))).id AS rid FROM dw.tab10;")
    assert(res.skippedStatements.isEmpty)
    assert(res.edges.exists { case (_, e) =>
      e.outColumn == "rid" && e.parentColumn == "col100l" })
    // value-level array(...) constructor untouched
    val keep = "SELECT array(1, 2) AS a FROM t"
    assert(SqlPreprocessor.rewritePrestoTypes(keep) == keep)
  }

  test("preprocessor: CROSS JOIN UNNEST rewrites to LATERAL VIEW explode") {
    val out = SqlPreprocessor.rewriteUnnest(
      "SELECT x FROM t CROSS JOIN UNNEST(arr) AS u (x) WHERE x > 0")
    assert(out == "SELECT x FROM t LATERAL VIEW explode(arr) u AS x WHERE x > 0")
    // ordinary cross join untouched
    val cj = "SELECT * FROM a CROSS JOIN b"
    assert(SqlPreprocessor.rewriteUnnest(cj) == cj)
  }

  test("presto CROSS JOIN UNNEST form of 0004 extracts identical lineage to the Hive form") {
    val hive = edges("0004").map { case (t, e) =>
      (t, e.outColumn, e.parentSchema, e.parentTable, e.parentColumn, e.context)
    }.sorted
    val presto = LineageRunner.run(
      spark, graft.operators.LineageQueries.prestoScript0004).edges.map { case (t, e) =>
      (t, e.outColumn, e.parentSchema, e.parentTable, e.parentColumn, e.context)
    }.sorted
    assert(presto.nonEmpty && presto == hive)
  }

  test("QUALIFY script extracts lineage without skip-routing") {
    val res = LineageRunner.run(spark, graft.operators.LineageQueries.qualifyScript)
    assert(res.skippedStatements.isEmpty)
    val rnParents = res.edges.collect {
      case (_, e) if e.outColumn == "rn" && e.context == "SELECT" =>
        s"${e.parentSchema}.${e.parentTable}.${e.parentColumn}"
    }.toSet
    assert(rnParents == Set("dw.tab10.col100l", "dw.tab10.col103i"))
    // the inline-window statement's output column survives the rewrite
    assert(res.edges.exists { case (_, e) =>
      e.outColumn == "col201s" && e.parentColumn == "col201s" })
  }

  test("preprocessor: AT TIME ZONE rewrites to from_utc_timestamp, lineage preserved") {
    // operand shapes: bare identifier, qualified, function call, literal
    assert(SqlPreprocessor.rewriteAtTimeZone(
      "SELECT ts AT TIME ZONE 'UTC' AS t FROM e")
      == "SELECT from_utc_timestamp(ts, 'UTC') AS t FROM e")
    assert(SqlPreprocessor.rewriteAtTimeZone(
      "SELECT hour(x.ts AT TIME ZONE 'America/New_York') FROM e x")
      == "SELECT hour(from_utc_timestamp(x.ts, 'America/New_York')) FROM e x")
    assert(SqlPreprocessor.rewriteAtTimeZone(
      "SELECT date_trunc('hour', ts) AT TIME ZONE 'UTC' FROM e")
      == "SELECT from_utc_timestamp(date_trunc('hour', ts), 'UTC') FROM e")
    assert(SqlPreprocessor.rewriteAtTimeZone(
      "SELECT TIMESTAMP '2024-01-01 00:00:00' AT TIME ZONE 'UTC'")
      == "SELECT from_utc_timestamp(TIMESTAMP '2024-01-01 00:00:00', 'UTC')")
    // the statement extracts the same edges as its hand-rewritten form
    val dialect = LineageRunner.run(spark,
      "SELECT CAST(col101s AS TIMESTAMP) AT TIME ZONE 'America/Los_Angeles' " +
        "AS local_ts FROM dw.tab10;")
    assert(dialect.skippedStatements.isEmpty, "AT TIME ZONE skip-routed")
    val manual = LineageRunner.run(spark,
      "SELECT from_utc_timestamp(CAST(col101s AS TIMESTAMP), " +
        "'America/Los_Angeles') AS local_ts FROM dw.tab10;")
    def es(r: LineageRunner.Result) = r.edges.map { case (_, e) =>
      (e.outColumn, e.parentSchema, e.parentTable, e.parentColumn, e.context)
    }.sorted
    assert(es(dialect).nonEmpty && es(dialect) == es(manual))
    assert(es(dialect).exists(_._4 == "col101s"))
  }

  test("preprocessor: ACTIVITY_COUNT rewrites to a constant, statement keeps lineage") {
    assert(SqlPreprocessor.rewriteActivityCount("SELECT ACTIVITY_COUNT")
      == "SELECT CAST(0 AS BIGINT)")
    // identifiers containing the word are untouched
    val keep = "SELECT activity_count_total FROM t"
    assert(SqlPreprocessor.rewriteActivityCount(keep) == keep)
    val res = LineageRunner.run(spark,
      "SELECT col100l, ACTIVITY_COUNT AS prev_rows FROM dw.tab10;")
    assert(res.skippedStatements.isEmpty, "ACTIVITY_COUNT skip-routed")
    assert(res.edges.exists { case (_, e) =>
      e.outColumn == "col100l" && e.parentColumn == "col100l" })
  }

  test("SyntaxCheck: all four reference exit codes (0/1/2/3) reproduced") {
    import java.nio.file.Files
    val ok = Files.createTempFile("graft_syn_ok", ".sql")
    Files.write(ok, "SELECT 1 AS a;\nSELECT 2 AS b;".getBytes)
    assert(SyntaxCheck.check(spark, ok.toString) == 0)
    val bad = Files.createTempFile("graft_syn_bad", ".sql")
    // unbalanced paren: unambiguous syntax error even with Spark's
    // non-reserved keywords (e.g. `SELECT FROM FROM WHERE` parses as
    // identifier FROM over a table named WHERE)
    Files.write(bad, "SELECT (1 + FROM t;".getBytes)
    assert(SyntaxCheck.check(spark, bad.toString) == 1)
    // 2 = non-syntax parser failure (reference: RecognitionException)
    assert(SyntaxCheck.classify(new RuntimeException("boom")) == 2)
    assert(SyntaxCheck.classify(new StackOverflowError().fillInStackTrace()) == 2)
    // 3 = unreadable input (reference: IOException)
    assert(SyntaxCheck.check(spark, "/nonexistent/graft/file.sql") == 3)
  }

  test("runner: GRANT/transactions/DML residue skip-routes, SELECT still extracts") {
    val res = LineageRunner.run(spark,
      """GRANT SELECT ON TABLE dw.tab10 TO ROLE analyst;
        |BEGIN TRANSACTION;
        |MERGE INTO dw.tab10 t USING dw.tab20 s ON t.col100l = s.col200l
        |  WHEN MATCHED THEN UPDATE SET col101s = s.col201s;
        |DELETE FROM dw.tab10 WHERE col100l = 1;
        |SELECT col100l FROM dw.tab10;""".stripMargin)
    assert(res.skippedStatements.size == 4)
    assert(res.edges.exists { case (_, e) =>
      e.outColumn == "col100l" && e.parentTable == "tab10" })
  }

  test("runner: CREATE TEMPORARY FUNCTION registers a shim for later calls") {
    val res = LineageRunner.run(spark,
      """CREATE TEMPORARY FUNCTION my_fn AS 'com.example.MyUdf';
        |SELECT my_fn(col101s) AS fx FROM dw.tab10;""".stripMargin)
    assert(res.edges.exists { case (_, e) =>
      e.outColumn == "fx" && e.parentColumn == "col101s" })
  }

  test("closure: distance-2 lineage through a created table (case 0010)") {
    import spark.implicits._
    val res = LineageRunner.run(spark, graft.operators.LineageQueries.scripts("0010"))
    val tableEdges = res.edges.collect {
      case (tgt, e) if tgt.nonEmpty => (tgt, s"${e.parentSchema}.${e.parentTable}")
    }.distinct.toDF("child", "parent")
    val closed = Closure.close(tableEdges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(closed.contains(("default.conforming_case_1", "dw.tab10", 2)))
    assert(closed.contains(("default.conforming_case_1", "default.base_user_team", 1)))
  }
}
