package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.lineage.SqlPreprocessor

/** Parser extension: `spark.sql(...)` accepts the reference corpus's
  * dialect surface directly. Statement text is rewritten by the same
  * [[SqlPreprocessor.rewriteDialect]] pass the lineage pipeline uses —
  * T-SQL `SELECT TOP n`, Teradata `SEL`/`ACTIVITY_COUNT`, Presto
  * `AT TIME ZONE`/type names/`ARRAY[...]`/`UNNEST`, `QUALIFY`, 2-arg
  * `max`/`min` — then handed to Spark's native parser, so the plan,
  * analysis, and optimization are stock Catalyst. Everything that is
  * NOT a whole SQL statement (expressions, identifiers, schemas)
  * delegates untouched: dialect divergence lives at statement level.
  *
  * Attached via [[graft.GraftExtensions]] (injectParser).
  */
class DialectParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(SqlPreprocessor.rewriteDialect(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(SqlPreprocessor.rewriteDialect(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
