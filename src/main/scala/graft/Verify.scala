package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4.1's HybridAnalyzer dual-runs every plan through the legacy
      // fixed-point AND the new single-pass resolver to cross-validate
      // them, roughly doubling analysis cost -- a fixed per-query tax that
      // dominated short queries (q01: 4.2s -> 1.7s with it off). One
      // analysis pass is enough here.
      .config("spark.sql.analyzer.singlePassResolver.dualRunWithLegacy", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated substring filter for local iteration; the
    // driver never sets it, so its 2-arg full-dump contract is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val errs = Seq.newBuilder[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.split(',').exists(name.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errs += ((name, s"${e.getClass.getName}: ${e.getMessage}"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The oracle dump honors the same filter as the query loop: a
    // filtered dump otherwise makes sweep_check (which iterates
    // oracle_sql.json) count every unrun query as a failure.
    val json = SparkEntry.oracleSql
      .filter { case (name, _) =>
        only.forall(_.split(',').exists(name.contains)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that throws leaves no output dir, so a downstream compare
    // that iterates dirs silently shrinks its coverage (the round-7
    // failure mode: one bad loader dropped 60 queries without a trace in
    // the artifact). Persist the failures so check.py can fail loudly.
    val failed = errs.result()
    val errJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED to run: " +
        failed.map(_._1).mkString(", "))
    spark.stop()
  }
}
