package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Hive partition-introspection functions (reference grammar
  * `MAX_PART_STRING/INT/DATE`, `MIN_PART_*`, `PART_COUNT`, `PART_LOC` —
  * Bingql.g4:1415-1434, lexer :2274-2284): catalog helper functions, not
  * row expressions (SURVEY §2.2 maps them to `spark.catalog
  * .listPartitions`). Values come from catalog metadata only — no data
  * scan, so cost is independent of table size (the property that makes
  * `WHERE dt = MAX_PART_STRING(t)` the standard 100 TB latest-partition
  * idiom: partition pruning kicks in on a constant).
  *
  * `expand` substitutes calls inside SQL text before parsing, the
  * Spark-first stand-in for the reference's special-function handling.
  */
object PartitionIntrospect {

  private def partitions(spark: SparkSession, table: String) = {
    val parts = table.split('.')
    val ident =
      if (parts.length >= 2) TableIdentifier(parts.last, Some(parts.dropRight(1).mkString(".")))
      else TableIdentifier(table)
    spark.sessionState.catalog.listPartitions(ident)
  }

  private def values(spark: SparkSession, table: String, partCol: String): Seq[String] =
    partitions(spark, table).flatMap(_.spec.get(partCol))

  def maxPartString(spark: SparkSession, table: String, partCol: String): Option[String] =
    values(spark, table, partCol).maxOption

  def minPartString(spark: SparkSession, table: String, partCol: String): Option[String] =
    values(spark, table, partCol).minOption

  def maxPartInt(spark: SparkSession, table: String, partCol: String): Option[Int] =
    values(spark, table, partCol).flatMap(_.toIntOption).maxOption

  def minPartInt(spark: SparkSession, table: String, partCol: String): Option[Int] =
    values(spark, table, partCol).flatMap(_.toIntOption).minOption

  /** ISO yyyy-MM-dd partition values order lexically == chronologically. */
  def maxPartDate(spark: SparkSession, table: String, partCol: String): Option[String] =
    maxPartString(spark, table, partCol)

  def minPartDate(spark: SparkSession, table: String, partCol: String): Option[String] =
    minPartString(spark, table, partCol)

  def partCount(spark: SparkSession, table: String): Int =
    partitions(spark, table).size

  /** Storage location of one partition, by spec. */
  def partLoc(spark: SparkSession, table: String, spec: Map[String, String]): Option[String] =
    partitions(spark, table)
      .find(p => spec.forall { case (k, v) => p.spec.get(k).contains(v) })
      .flatMap(p => Option(p.location).map(_.toString))

  private val CallRe =
    """(?i)\b(max_part_string|min_part_string|max_part_int|min_part_int|max_part_date|min_part_date|part_count)\s*\(\s*'([\w.]+)'\s*(?:,\s*'(\w+)'\s*)?\)""".r

  /** A partition value as a safe single-quoted SQL literal for Spark's
    * parser: backslashes and quotes backslash-escaped. */
  private def sqlStringLit(v: String): String =
    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Replace partition-introspection calls in SQL text with literal
    * values resolved from the catalog (pre-parse substitution — the
    * constant is what lets Catalyst prune partitions statically).
    * Replacements go through `Regex.quoteReplacement` and quote/backslash
    * escaping, so partition values containing `$`, `\` or `'` neither
    * throw group-reference errors nor corrupt the rewritten statement. */
  def expand(spark: SparkSession, sql: String): String =
    CallRe.replaceAllIn(sql, m => {
      val (fn, table, col) = (m.group(1).toLowerCase, m.group(2), Option(m.group(3)))
      def c = col.getOrElse(throw new IllegalArgumentException(
        s"$fn('$table') needs a partition-column argument"))
      val lit = fn match {
        case "max_part_string" | "max_part_date" =>
          maxPartString(spark, table, c).map(sqlStringLit).getOrElse("NULL")
        case "min_part_string" | "min_part_date" =>
          minPartString(spark, table, c).map(sqlStringLit).getOrElse("NULL")
        case "max_part_int" => maxPartInt(spark, table, c).map(_.toString).getOrElse("NULL")
        case "min_part_int" => minPartInt(spark, table, c).map(_.toString).getOrElse("NULL")
        case "part_count" => partCount(spark, table).toString
      }
      scala.util.matching.Regex.quoteReplacement(lit)
    })
}
