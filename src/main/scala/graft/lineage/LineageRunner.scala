package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedPartitionSpec, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.CreateTableLikeCommand
import org.apache.spark.sql.types.StringType

/** Script-level lineage extraction — the Spark-first equivalent of the
  * reference's per-file pipeline (BatchProcessor.ParsingTask.run,
  * BatchProcessor.java:232-286): preprocess → per statement parse →
  * analyze → extract, maintaining session catalog state across
  * statements (USE, CREATE TABLE, CTAS targets).
  *
  * Permissive mode (SURVEY §7.4.1): the reference extracts lineage even
  * from scripts it can't fully validate ("90% coverage" philosophy,
  * README.md:81). We mirror that:
  *  - INSERT targets are NOT schema-validated: the insert's query is
  *    unwrapped pre-analysis, so ANSI store-assignment strictness and
  *    missing targets don't kill extraction;
  *  - unknown functions (the reference accepts any `ident(args)`,
  *    Bingql.g4:1436-1442) are shimmed on the fly with a pass-through
  *    that preserves argument references, then analysis is retried;
  *  - Hive-only DDL (STORED AS / typed PARTITIONED BY / s3 LOCATION) is
  *    registered schema-only via the parsed column definitions.
  */
object LineageRunner {

  final case class Result(
      edges: Seq[(String, ColumnEdge)], // (targetTable or "", edge)
      inserts: Seq[TableInsert],
      datasets: Seq[DatasetNode],
      items: Seq[(String, SelectItemNode)] = Seq.empty, // (targetTable or "", item)
      addPartitions: Seq[AddPartitionEvent] = Seq.empty,
      drops: Seq[TableDrop] = Seq.empty,
      /** Names of top-level SELECT datasets, in statement order — the
        * consumption end-nodes a dashboard source links to
        * (reference dashboard_dataset, LineageDbService.java:200-213). */
      topSelects: Seq[String] = Seq.empty,
      /** Statements skipped as non-lineage residue — unparseable
        * (GRANT, transactions, HPL-SQL procedural leftovers) or
        * parse-only DML (MERGE/UPDATE/DELETE). The reference's grammar
        * swallows these with no visitor (90%-coverage stance); we
        * record them instead of aborting the script. */
      skippedStatements: Seq[String] = Seq.empty)

  /** Registered physical columns of a created table become TABLE-dataset
    * select_item rows (reference visitCreate_table_columns,
    * SqlMetaDataExtractor.java:754-792) — the rows the local metastore
    * fallback later reconstructs schemas from. */
  private def tableItems(
      db: String, tbl: String, cols: Seq[(String, String)]): Seq[(String, SelectItemNode)] =
    cols.map { case (name, dt) =>
      s"$db.$tbl" -> SelectItemNode(name, name, "", "SELECT",
        isSimpleColumn = true, dataType = dt, functionType = "",
        mapToSchema = db, mapToTable = tbl, mapToColumn = name,
        datasetType = "TABLE")
    }

  def run(spark: SparkSession, script: String,
      metaStore: Option[MetaStore] = None): Result = {
    FixtureCatalog.register(spark)
    spark.sql("USE default")
    val edges = Seq.newBuilder[(String, ColumnEdge)]
    val inserts = scala.collection.mutable.ArrayBuffer.empty[TableInsert]
    val dsNodes = Seq.newBuilder[DatasetNode]
    val items = Seq.newBuilder[(String, SelectItemNode)]
    val addParts = Seq.newBuilder[AddPartitionEvent]
    val drops = Seq.newBuilder[TableDrop]
    val topSelects = scala.collection.mutable.ArrayBuffer.empty[String]
    // Same-script DROP bookkeeping (reference droppedTables,
    // SqlMetaDataExtractor.java:46,637,894) + CREATE ... LOCATION capture
    // for later ALTER ADD PARTITION default locations.
    val droppedTables = scala.collection.mutable.HashSet.empty[String]
    val storageLocs = scala.collection.mutable.HashMap.empty[String, String]

    // Temporary tables (reference tmptblCache + closeSession rename,
    // SqlMetaDataExtractor.java:79-100): Spark's parser rejects CREATE
    // TEMPORARY TABLE, so the keyword is stripped pre-parse and the name
    // remembered — the created dataset becomes TEMPORARY_TABLE, and the
    // store renames its mapping out of scope at write time.
    val TempCreate = """(?is)^\s*create\s+temporary\s+(table\s+.*)$""".r
    val tempTables = scala.collection.mutable.HashSet.empty[String]

    val skippedStmts = Seq.newBuilder[String]

    SqlPreprocessor.preprocess(script).foreach { stmt0 =>
      val (stmt, isTemp) = stmt0 match {
        case TempCreate(rest) => (s"CREATE $rest", true)
        case other => (other, false)
      }
      // Statements Spark can't parse (GRANT, BEGIN/COMMIT, HPL-SQL
      // residue) are skip-routed, not fatal — the reference accepts them
      // grammar-side and ignores them visitor-side.
      val parsedOpt =
        try Some(spark.sessionState.sqlParser.parsePlan(stmt))
        catch {
          case _: org.apache.spark.sql.catalyst.parser.ParseException =>
            skippedStmts += stmt
            None
        }
      parsedOpt.foreach { parsed =>
      if (isTemp) parsed match {
        case ct: CreateTable => tempTables += identOf(spark, ct.name).toString
        case ctas: CreateTableAsSelect => tempTables += identOf(spark, ctas.name).toString
        case _ => ()
      }
      parsed match {
        case _: SetCatalogAndNamespace =>
          spark.sql(stmt)

        case ct: CreateTable =>
          val (db, tbl) = identOf(spark, ct.name)
          registerParsedTable(spark, db, tbl, ct)
          val loc = ct.tableSpec match {
            case u: UnresolvedTableSpec => u.location.getOrElse("")
            case t: TableSpec => t.location.getOrElse("")
            case _ => ""
          }
          if (loc.nonEmpty) storageLocs(s"$db.$tbl") = loc
          droppedTables -= s"$db.$tbl"
          val dsType =
            if (tempTables.contains((db, tbl).toString)) "TEMPORARY_TABLE" else "TABLE"
          dsNodes += DatasetNode(s"$db.$tbl", dsType, db, tbl, storageLoc = loc)
          items ++= tableItems(db, tbl, ct.columns.map(c => c.name -> c.dataType.sql))

        case ctas: CreateTableAsSelect =>
          val (db, tbl) = identOf(spark, ctas.name)
          droppedTables -= s"$db.$tbl"
          inserts += TableInsert(db, tbl, "CREATE TABLE AS")
          val analyzed = analyzePermissive(spark, ctas.query, metaStore)
          edges ++= LineageWalker.edgesOf(analyzed).map(e => s"$db.$tbl" -> e)
          items ++= LineageWalker.selectItems(analyzed).map(it => s"$db.$tbl" -> it)
          items ++= tableItems(db, tbl,
            analyzed.output.map(a => a.name -> a.dataType.sql))
          // Register the created table so later statements resolve it.
          val cols = analyzed.output
            .map(a => s"`${a.name}` ${a.dataType.sql}").mkString(", ")
          FixtureCatalog.ensureTable(spark, db, tbl, cols)
          dsNodes += DatasetNode(s"$db.$tbl",
            if (tempTables.contains((db, tbl).toString)) "TEMPORARY_TABLE" else "TABLE",
            db, tbl)

        case w: UnresolvedWith if collectInserts(w.child).nonEmpty =>
          // Hive multi-table INSERT sharing a CTE/FROM
          // (SqlMetaDataExtractor.java:163-169, test 0009): extract each
          // INSERT branch separately under the same CTE scope.
          collectInserts(w.child).foreach { ins =>
            val (db, tbl) = insertTarget(spark, ins)
            inserts += TableInsert(db, tbl, insertType(ins))
            val branch = w.copy(child = ins.query)
            val analyzed = analyzePermissive(spark, branch, metaStore)
            edges ++= LineageWalker.edgesOf(analyzed).map(e => s"$db.$tbl" -> e)
            items ++= LineageWalker.selectItems(analyzed).map(it => s"$db.$tbl" -> it)
          }

        case ins: InsertIntoStatement =>
          val (db, tbl) = insertTarget(spark, ins)
          inserts += TableInsert(db, tbl, insertType(ins))
          val analyzed = analyzePermissive(spark, ins.query, metaStore)
          edges ++= LineageWalker.edgesOf(analyzed).map(e => s"$db.$tbl" -> e)
          items ++= LineageWalker.selectItems(analyzed).map(it => s"$db.$tbl" -> it)

        case d: DropTable =>
          // Reference removeTable (LineageDbService.java:274-287): purge
          // this job's table_insert rows for the table and remember the
          // drop so a later same-script CREATE sees it gone.
          val (db, tbl) = d.child match {
            case u: UnresolvedTableOrView => qualify(spark, u.multipartIdentifier)
            case u: UnresolvedIdentifier => qualify(spark, u.nameParts)
            case other => ("", other.nodeName)
          }
          inserts.filterInPlace(t => !(t.dbSchema == db && t.dbTable == tbl))
          droppedTables += s"$db.$tbl"
          drops += TableDrop(db, tbl)
          spark.sql(s"DROP TABLE IF EXISTS `$db`.`$tbl`")

        case ap: AddPartitions =>
          // Reference visitAlter_table_stmt (SqlMetaDataExtractor.java:
          // 848-869): only ADD PARTITION matters — record a
          // table_add_partition event carrying the partition LOCATION,
          // falling back to the table's storage location.
          val (db, tbl) = ap.table match {
            case u: UnresolvedTable => qualify(spark, u.multipartIdentifier)
            case other => ("", other.nodeName)
          }
          val tableLoc = storageLocs.getOrElse(s"$db.$tbl",
            try spark.sessionState.catalog
              .getTableMetadata(TableIdentifier(tbl, Some(db)))
              .storage.locationUri.map(_.toString).getOrElse("")
            catch { case _: Exception => "" })
          ap.parts.foreach {
            case p: UnresolvedPartitionSpec =>
              addParts += AddPartitionEvent(db, tbl, p.location.getOrElse(tableLoc))
            case _ =>
              addParts += AddPartitionEvent(db, tbl, tableLoc)
          }

        case like: CreateTableLikeCommand =>
          // CREATE TABLE ... LIKE: clone the source schema
          // (reference create_table_like_clause, Bingql.g4; the clone is
          // a TABLE dataset whose columns map to itself, not the source —
          // LIKE copies structure, not data lineage).
          val (db, tbl) = (like.targetTable.database
            .getOrElse(spark.catalog.currentDatabase), like.targetTable.table)
          val srcDf = spark.table(like.sourceTable.quotedString)
          val cols = srcDf.schema.fields.toSeq.map(f => f.name -> f.dataType.sql)
          FixtureCatalog.ensureTable(spark, db, tbl,
            cols.map { case (n, t) => s"`$n` $t" }.mkString(", "))
          droppedTables -= s"$db.$tbl"
          dsNodes += DatasetNode(s"$db.$tbl", "TABLE", db, tbl)
          items ++= tableItems(db, tbl, cols)

        case dir: InsertIntoDir =>
          // INSERT OVERWRITE [LOCAL] DIRECTORY '<path>': lineage lands on
          // the directory as the write target (reference grammar
          // Bingql.g4:695-697; parse-only there, executed here).
          val path = dir.storage.locationUri.map(_.toString).getOrElse("")
          val tgt = s"dir:$path"
          inserts += TableInsert("", tgt,
            if (dir.isLocal) "INSERT OVERWRITE LOCAL DIRECTORY"
            else "INSERT OVERWRITE DIRECTORY")
          val analyzed = analyzePermissive(spark, dir.child, metaStore)
          edges ++= LineageWalker.edgesOf(analyzed).map(e => tgt -> e)
          items ++= LineageWalker.selectItems(analyzed).map(it => tgt -> it)

        case _: ShowTables | _: DescribeRelation | _: ShowPartitions |
            _: TruncateTable | _: ShowColumns =>
          () // introspection/maintenance: routed, no lineage (reference
             // parses and skips these, BatchProcessor skip-routing)

        case _: MergeIntoTable | _: UpdateTable | _: DeleteFromTable =>
          // Parse-only DML parity (reference grammar accepts
          // MERGE/UPDATE/DELETE with no visitor, Bingql.g4 merge_stmt
          // etc.): recorded as skipped, never fatal.
          skippedStmts += stmt

        case fn: org.apache.spark.sql.execution.command.CreateFunctionCommand =>
          // CREATE TEMPORARY FUNCTION name AS 'cls' (reference accepts
          // any ident(args) call, Bingql.g4:1436-1442): register the
          // pass-through shim up front so later calls resolve without
          // the analyze-retry loop.
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            fn.identifier.funcName,
            (exprs: Seq[Expression]) => Concat(exprs.map(Cast(_, StringType))),
            "scala_udf")

        case query =>
          val analyzed = analyzePermissive(spark, query, metaStore)
          edges ++= LineageWalker.edgesOf(analyzed).map(e => "" -> e)
          items ++= LineageWalker.selectItems(analyzed).map(it => "" -> it)
          // The top-level SELECT is itself a dataset — the consumption
          // end-node a dashboard links to (reference closeSession,
          // SqlMetaDataExtractor.java:102-112).
          val name = s"query_${topSelects.size}"
          dsNodes += DatasetNode(name, "SUBQUERY", "", "")
          topSelects += name
      }
      }
    }
    Result(edges.result(), inserts.toSeq, dsNodes.result(), items.result(),
      addParts.result(), drops.result(), topSelects.toSeq, skippedStmts.result())
  }

  /** Multi-insert branches under a shared FROM (Union of inserts). */
  private def collectInserts(p: LogicalPlan): Seq[InsertIntoStatement] = p match {
    case u: Union => u.children.flatMap(collectInserts)
    case i: InsertIntoStatement => Seq(i)
    case _ => Seq.empty
  }

  private def insertType(i: InsertIntoStatement): String =
    if (i.overwrite) "INSERT OVERWRITE TABLE" else "INSERT INTO TABLE"

  private def insertTarget(spark: SparkSession, i: InsertIntoStatement): (String, String) =
    i.table match {
      case u: UnresolvedRelation => qualify(spark, u.multipartIdentifier)
      case other => ("", other.nodeName)
    }

  private def identOf(spark: SparkSession, name: LogicalPlan): (String, String) =
    name match {
      case u: UnresolvedIdentifier => qualify(spark, u.nameParts)
      case other => ("", other.toString)
    }

  private def qualify(spark: SparkSession, parts: Seq[String]): (String, String) =
    if (parts.length >= 2) (parts.dropRight(1).mkString("."), parts.last)
    else (spark.catalog.currentDatabase, parts.last)

  /** Register a parsed CREATE TABLE schema-only (USING parquet), ignoring
    * Hive-only storage clauses and external locations. */
  private def registerParsedTable(
      spark: SparkSession, db: String, tbl: String, ct: CreateTable): Unit = {
    val colDefs = ct.columns.map(c => s"`${c.name}` ${c.dataType.sql}")
    val partCols = ct.partitioning.flatMap(_.references.map(_.fieldNames().mkString(".")))
    val declared = ct.columns.map(_.name).toSet
    // Hive-style typed partition columns may not be in `columns`.
    val missingParts = partCols.filterNot(declared.contains).map(p => s"`$p` string")
    FixtureCatalog.ensureTable(spark, db, tbl, (colDefs ++ missingParts).mkString(", "))
  }

  /** Resolve a plan WITHOUT CheckAnalysis — the reference extracts
    * lineage from scripts it can't fully validate (90%-coverage
    * philosophy, README.md:81), and Hive-lenient SQL in its own corpus
    * (e.g. `SELECT col, count(*)` with no GROUP BY in 0006) resolves but
    * fails Spark's CheckAnalysis. Spark itself skips CheckAnalysis for
    * command inner children, so this matches whole-statement behavior.
    *
    * Unknown functions (the reference accepts any `ident(args)`,
    * Bingql.g4:1436-1442, README.md:80) are shimmed with a pass-through
    * preserving argument references, then resolution is retried.
    */
  def analyzePermissive(spark: SparkSession, plan: LogicalPlan,
      metaStore: Option[MetaStore] = None): LogicalPlan = {
    // LookupFunctions throws from a RESOLUTION batch (not CheckAnalysis),
    // so unknown functions surface as exceptions even under
    // analyzer.execute — catch, shim, retry.
    val Unresolved = """.*Cannot resolve routine `([^`]+)`.*""".r
    var attempt = 0
    while (true) {
      try {
        // Re-analysis of the SAME plan object after a failed relation
        // lookup stays unresolved (a per-node memo survives the first
        // execute); clone() yields a fresh tree the analyzer fully
        // re-resolves, so catalog changes between attempts take effect.
        val analyzed = spark.sessionState.analyzer.execute(plan.clone())
        // Missing relations do NOT throw from analyzer.execute (only
        // CheckAnalysis reports them) — the node just stays unresolved.
        // Resolve its schema from the pluggable metastore, register, and
        // re-analyze (reference lookup-then-cache flow,
        // SqlMetaDataExtractor.java:898-929).
        val missing = analyzed.collectFirst { case u: UnresolvedRelation => u }
        missing match {
          case Some(u) if metaStore.isDefined && attempt < 8 =>
            val parts = u.multipartIdentifier
            val (db, tbl) =
              if (parts.length >= 2) (parts.dropRight(1).mkString("."), parts.last)
              else (spark.catalog.currentDatabase, parts.last)
            metaStore.get.lookup(db, tbl) match {
              case Some(cols) =>
                FixtureCatalog.ensureTable(spark, db, tbl,
                  cols.map { case (n, t) => s"`$n` $t" }.mkString(", "))
                attempt += 1
              case None => return analyzed // permissive: leave unresolved
            }
          case _ => return analyzed
        }
      } catch {
        case e: org.apache.spark.sql.AnalysisException
          if attempt < 8 && e.getMessage != null &&
            e.getMessage.contains("UNRESOLVED_ROUTINE") =>
          val fname = e.getMessage.replaceAll("\n", " ") match {
            case Unresolved(n) => n
            case _ => throw e
          }
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            fname,
            (exprs: Seq[Expression]) => Concat(exprs.map(Cast(_, StringType))),
            "scala_udf")
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
