package graft

import org.scalatest.funsuite.AnyFunSuite

/** ManifestCatalog: the connector behind Spark's native catalog
  * machinery (q430's mechanism). Pins CREATE/INSERT/SELECT/DELETE/
  * TRUNCATE/DROP through pure SQL, native VERSION AS OF / TIMESTAMP AS
  * OF resolution, untranslatable-delete refusal, and catalog metadata
  * behavior (exists/list/duplicate-create).
  */
class ManifestCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val name = "cat_" + math.abs(base.hashCode)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  test("create / insert / select / delete / truncate / drop via SQL") {
    val (cat, base) = freshCatalog()
    val t = s"$cat.ns.t1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    assert(new java.io.File(s"$base/ns/t1/_schema.ddl").exists())
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"INSERT INTO $t VALUES (4, 'd')")
    def rows() = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows() == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // merge-on-read delete via SupportsDelete
    spark.sql(s"DELETE FROM $t WHERE k <= 2")
    assert(rows() == Seq((3L, "c"), (4L, "d")))
    // the pre-delete snapshot still reads whole
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 2")
      .first().getLong(0) == 4L)
    // INSERT OVERWRITE truncates
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'z')")
    assert(rows() == Seq((9L, "z")))
    spark.sql(s"DROP TABLE $t")
    assert(!spark.catalog.tableExists(t))
  }

  test("TIMESTAMP AS OF resolves through commit instants") {
    val (cat, base) = freshCatalog()
    val t = s"$cat.ns.t2"
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    Thread.sleep(30)
    spark.sql(s"INSERT INTO $t VALUES (10)")
    Thread.sleep(30)
    spark.sql(s"INSERT INTO $t VALUES (100)")
    // the exact instant v2 published: reads must see exactly v2
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    val v2m = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$base/ns/t2/manifest-v2.json")).getModificationTime
    val ts = java.time.Instant.ofEpochMilli(v2m)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val s2 = spark.sql(
      s"SELECT CAST(sum(k) AS BIGINT) FROM $t TIMESTAMP AS OF '$ts'")
      .first().getLong(0)
    assert(s2 == 11L, s"TIMESTAMP AS OF '$ts' read $s2, expected v2 (11)")
    // a far-past instant has no snapshot: loud failure
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '2000-01-01'").collect()
    }
  }

  test("untranslatable DELETE predicates execute via the row-level path") {
    // Until round 13 these were REFUSED (canDeleteWhere=false was the
    // whole story); with SupportsRowLevelOperations, Spark now routes
    // them through the delta (merge-on-read) plan and they EXECUTE —
    // correctly, never mis-applied
    val (cat, _) = freshCatalog()
    val t = s"$cat.ns.t3"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"DELETE FROM $t WHERE k % 2 = 0") // % is no V1 filter
    assert(spark.sql(s"SELECT k FROM $t").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    // translatable compound predicates work too (metadata-only path)
    spark.sql(s"DELETE FROM $t WHERE k >= 1 AND v = 'a'")
    assert(spark.sql(s"SELECT count(*) FROM $t").first().getLong(0) == 0L)
  }

  test("PARTITIONED BY persists: SQL-only SPJ joins with zero exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.pa (b BIGINT, v1 BIGINT) PARTITIONED BY (b)")
    spark.sql(s"CREATE TABLE $cat.ns.pb (b BIGINT, v2 BIGINT) PARTITIONED BY (b)")
    // PARTITIONED BY a non-existent / non-bigint column fails loudly
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ns.bad (k STRING) PARTITIONED BY (k)")
    }
    spark.sql(
      s"INSERT INTO $cat.ns.pa SELECT id % 4, id FROM range(40)")
    spark.sql(
      s"INSERT INTO $cat.ns.pb SELECT id % 4, id * 10 FROM range(20)")
    // fan-out happened through the persisted spec (no write option)
    val entries = graft.sources.ManifestRead.entries(
      spark.conf.get(s"spark.sql.catalog.$cat.base") + "/ns/pa",
      "manifest.json")
    assert(entries.forall(_.pv.isDefined) && entries.forall(_.pt.contains("b")))
    graft.operators.LakehouseOps.withSpjConfs(spark) {
      val df = spark.sql(
        s"""SELECT a.b AS b, count(*) AS n
           |FROM $cat.ns.pa a JOIN $cat.ns.pb x ON a.b = x.b
           |GROUP BY a.b""".stripMargin)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(0L -> 50L, 1L -> 50L, 2L -> 50L, 3L -> 50L), s"$got")
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
        case q: QueryStageExec => q +: nodes(q.plan)
        case o => o +: (o.children ++ o.subqueries).flatMap(nodes)
      }
      val exchanges = nodes(df.queryExecution.executedPlan)
        .filter(_.isInstanceOf[ShuffleExchangeLike])
      assert(exchanges.isEmpty,
        s"catalog SPJ must plan zero exchanges:\n${df.queryExecution.executedPlan}")
    }
  }

  test("streaming tail via spark.readStream.table on a catalog table") {
    import org.apache.spark.sql.streaming.Trigger
    val (cat, _) = freshCatalog()
    val t = s"$cat.ns.st"
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1), (2)")
    val sink = java.nio.file.Files.createTempDirectory("graft_cat_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat_ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    spark.sql(s"INSERT INTO $t VALUES (10)")
    drain() // same checkpoint: only the new commit's files
    val got = spark.read.schema("k LONG").parquet(sink)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 10L), s"got $got")
  }

  test("unsafe identifier segments are rejected (no path escape)") {
    val (cat, base) = freshCatalog()
    // a backquoted `..` segment would map OUTSIDE base — and dropTable
    // recursively deletes the mapped directory
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`..`.esc (k BIGINT)")
    }
    assert(e.getMessage.contains("unsafe identifier segment"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"DROP TABLE $cat.ns.`../../etc`")
    }
    assert(e2.getMessage.contains("unsafe identifier segment"), e2.getMessage)
    assert(new java.io.File(base).exists())
  }

  test("catalog metadata: duplicate create fails, listTables, missing table") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.ta (k BIGINT)")
    spark.sql(s"CREATE TABLE $cat.ns.tb (k BIGINT)")
    intercept[Exception] { spark.sql(s"CREATE TABLE $cat.ns.ta (k BIGINT)") }
    val listed = spark.sql(s"SHOW TABLES IN $cat.ns")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(listed == Seq("ta", "tb"), s"$listed")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.ns.nope").collect()
    }
  }
}
