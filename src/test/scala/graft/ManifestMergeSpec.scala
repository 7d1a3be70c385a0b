package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL row-level DML on manifest catalog tables (q431's
  * mechanism): MERGE INTO / UPDATE / arbitrary-predicate DELETE planned
  * by Spark's row-level rewrite rules over the delta-based
  * (merge-on-read) [[graft.sources.ManifestRowLevelOperation]]. Pins:
  *  - all three MERGE clause kinds in one statement;
  *  - merge-on-read physics: original data files survive, deletes are
  *    positional vectors, one manifest version per statement;
  *  - snapshot isolation: pre-DML versions read unchanged, a commit
  *    that raced the operation aborts loudly (stale snapshot / live
  *    lock), and a failed statement publishes NOTHING;
  *  - compaction consumes DML delete vectors with the conservation
  *    guard intact (the lineHash leg each delta delete carries);
  *  - identity-partitioned tables keep their SPJ layout through MERGE.
  */
class ManifestMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_mrg").toString
    val name = "mrg_" + math.abs(base.hashCode)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  private def contents(t: String): Seq[(Long, String)] =
    spark.sql(s"SELECT k, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Table with k=1..6, v = "v1".."v6", committed as ONE version. */
  private def seed(cat: String): String = {
    val t = s"$cat.db.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES " +
      (1 to 6).map(i => s"($i, 'v$i')").mkString(", "))
    t
  }

  test("MERGE: matched update + matched delete + not-matched insert") {
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    val dir = s"$base/db/t"
    val seedFiles = graft.sources.ManifestRead.entries(dir, "manifest.json")
      .map(_.file).toSet
    spark.sql(
      s"""MERGE INTO $t t
         |USING (SELECT * FROM VALUES (2L, 'u2'), (4L, 'u4'), (9L, 'u9')
         |       AS s(k, v)) s
         |ON t.k = s.k
         |WHEN MATCHED AND t.k = 4 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |""".stripMargin)
    assert(contents(t) == Seq(1L -> "v1", 2L -> "u2", 3L -> "v3",
      5L -> "v5", 6L -> "v6", 9L -> "u9"))
    // merge-on-read physics: every seed file is still listed (nothing
    // rewritten), the matched rows became positional delete vectors,
    // and the whole statement is ONE new manifest version
    val entries = graft.sources.ManifestRead.entries(dir, "manifest.json")
    assert(seedFiles.subsetOf(entries.map(_.file).toSet),
      "every seed data file must survive the MERGE unrewritten")
    val dvs = graft.sources.ManifestRead.dvs(dir, "manifest.json")
    assert(dvs.map(_._2).sum == 2, s"2 superseded positions, got $dvs")
    assert(graft.sources.ManifestRead.latestVersion(dir) == 2)
  }

  test("UPDATE ... WHERE: executes via deltas; old snapshots untouched") {
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    spark.sql(s"UPDATE $t SET v = upper(v) WHERE k >= 5")
    assert(contents(t) == Seq(1L -> "v1", 2L -> "v2", 3L -> "v3",
      4L -> "v4", 5L -> "V5", 6L -> "V6"))
    // snapshot isolation: version 1 still reads the pre-UPDATE rows
    val v1 = spark.sql(s"SELECT k, v FROM $t VERSION AS OF 1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v1 == (1 to 6).map(i => (i.toLong, s"v$i")))
  }

  test("DELETE with an untranslatable predicate runs via deltas") {
    val (cat, _) = freshCatalog()
    val t = seed(cat)
    // length(v) is no V1 filter — canDeleteWhere refuses it, so Spark
    // must route through the row-level (WriteDelta) plan instead of
    // failing the statement
    spark.sql(s"DELETE FROM $t WHERE length(v) > 1 AND k % 2 = 0")
    assert(contents(t).map(_._1) == Seq(1L, 3L, 5L))
  }

  test("failed MERGE publishes nothing (atomic abort)") {
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    // duplicate source keys matching one target row: the delta plan's
    // cardinality check must fail the statement...
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t t
           |USING (SELECT * FROM VALUES (2L, 'a'), (2L, 'b') AS s(k, v)) s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |""".stripMargin)
    }
    // ...and leave NO partial state: same contents, same version head
    assert(contents(t) == (1 to 6).map(i => (i.toLong, s"v$i")))
    assert(graft.sources.ManifestRead.latestVersion(s"$base/db/t") == 1)
  }

  test("live commit lock: DML aborts loudly, retry succeeds") {
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    val dir = new org.apache.hadoop.fs.Path(s"$base/db/t")
    val fs = dir.getFileSystem(
      spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, "_commit.lock")
    fs.create(lock, false).close()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = 'x' WHERE k = 1")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("concurrent commit in flight")), e)
    fs.delete(lock, false)
    spark.sql(s"UPDATE $t SET v = 'x' WHERE k = 1")
    assert(contents(t).head == (1L -> "x"))
  }

  test("stale snapshot: a commit that raced the operation aborts") {
    import org.apache.spark.sql.connector.write._
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    val dir = s"$base/db/t"
    val tblSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    // the operation pins v1 as its snapshot...
    val op = new graft.sources.ManifestRowLevelOperation(
      dir, tblSchema, RowLevelOperation.Command.UPDATE, None)
    // ...then a concurrent commit moves the head to v2
    spark.sql(s"INSERT INTO $t VALUES (7, 'v7')")
    val info = new LogicalWriteInfo {
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
      override def queryId(): String = "spec"
      override def schema() = tblSchema
    }
    val batch = op.newWriteBuilder(info).build().toBatch
    val e = intercept[IllegalStateException] {
      batch.commit(Array(graft.sources.ManifestDeltaCommit(Nil,
        Seq(graft.sources.ManifestFileCommit("dvstage-x.csv", 1, 0)))))
    }
    assert(e.getMessage.contains("no longer the head"), e.getMessage)
    // nothing published: head still v2, contents intact
    assert(graft.sources.ManifestRead.latestVersion(dir) == 2)
    assert(contents(t).length == 7)
  }

  test("compaction consumes MERGE delete vectors, conservation intact") {
    val (cat, base) = freshCatalog()
    val t = seed(cat)
    spark.sql(
      s"""MERGE INTO $t t USING (SELECT * FROM VALUES (1L, 'z1'), (6L, 'z6')
         |  AS s(k, v)) s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |""".stripMargin)
    val before = contents(t)
    val dir = s"$base/db/t"
    assert(graft.sources.ManifestRead.dvs(dir, "manifest.json").nonEmpty)
    // the physical rewrite must subtract exactly the deleted rows'
    // line hashes — the metadata leg the delta writer recorded
    val (nb, na) = graft.sources.ManifestMaintenance.compact(
      spark, dir, "k BIGINT, v STRING", targetFiles = 1)
    assert(na == 1, s"($nb, $na)")
    assert(graft.sources.ManifestRead.dvs(dir, "manifest.json").isEmpty)
    assert(contents(t) == before)
  }

  test("MERGE keeps identity partitioning: new files carry pv") {
    val (cat, base) = freshCatalog()
    val t = s"$cat.db.p"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) PARTITIONED BY (k)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(
      s"""MERGE INTO $t t USING (SELECT * FROM VALUES (2L, 'B'), (3L, 'C')
         |  AS s(k, v)) s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |""".stripMargin)
    assert(contents(t) == Seq(1L -> "a", 2L -> "B", 3L -> "C"))
    val entries =
      graft.sources.ManifestRead.entries(s"$base/db/p", "manifest.json")
    assert(entries.forall(e => e.pv.isDefined && e.pt.contains("k")),
      s"every file (including MERGE inserts) must stay keyed: $entries")
  }

  test("DML on a time-travel snapshot is refused") {
    val (cat, _) = freshCatalog()
    val t = seed(cat)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t VERSION AS OF 1 SET v = 'x' WHERE k = 1")
    }
    assert(e.getMessage != null)
  }
}
