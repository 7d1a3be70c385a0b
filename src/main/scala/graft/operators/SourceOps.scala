package graft.operators

import graft.{Q, Tables}
import graft.sources.CopyOps

/** Source/sink operators beyond parquet (SURVEY §2.1): COPY-style
  * delimited bulk load/export round trips.
  */
object SourceOps {

  /** COPY round trip (reference copy_stmt / copy_from_local_stmt,
    * Bingql.g4:770-797 — parse-only there): export `nation` to CSV, bulk
    * load it back with an explicit schema (no inference pass), aggregate.
    * The oracle reads the original parquet — value equality proves the
    * delimited round trip is faithful. */
  private val q112 = Q(
    "q112_copy_roundtrip",
    """SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions._
    val nation = Tables.load(s, dir, "nation")
    val csvDir = "/tmp/graft_copy_nation"
    CopyOps.copyTo(nation, csvDir)
    CopyOps.copyFromLocal(s, Seq(csvDir), nation.schema)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"), min("n_name").as("first_name"))
      .orderBy("n_regionkey")
  }

  val defs: Seq[Q] = Seq(q112)
}
