package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** The SQL catalog surface (`graft.sources.GraftCatalog`): a directory of
  * lakes as a Spark TableCatalog — CREATE/INSERT/SELECT with pushdown,
  * `VERSION AS OF` / `TIMESTAMP AS OF` time travel, ALTER mapped to the
  * lake's zero-rewrite evolution ops, DELETE via deletion vectors, DROP
  * and RENAME. All surfaces share one layout: the API, `format("graft")`,
  * and the catalog see every write.
  */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private val cat = "glakes"
  // registered at construction time — the catalog must exist before the
  // first SQL statement of the first test resolves a 2-part name
  private val root: String = {
    val r = Files.createTempDirectory("graft_catalog").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", r)
    r
  }

  test("CREATE TABLE + INSERT + SELECT: declared schema bootstraps the empty lake") {
    spark.sql(
      s"CREATE TABLE $cat.t1 (id BIGINT, name STRING, part STRING) PARTITIONED BY (part)")
    assert(spark.table(s"$cat.t1").schema.fieldNames.toSet == Set("id", "name", "part"))
    spark.sql(s"INSERT INTO $cat.t1 VALUES (1, 'a', 'p1'), (2, 'b', 'p2')")
    spark.sql(s"INSERT INTO $cat.t1 VALUES (3, 'c', 'p1')") // appends
    val got = spark.sql(s"SELECT id, name FROM $cat.t1 WHERE part = 'p1'")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c")))
    // the API sees the same lake (one layout, every surface)
    val lake = new SnapshotLake(spark, s"$root/t1")
    assert(lake.read(Seq("part")).count() == 3L)
    // and CREATE of an existing table refuses
    val e = intercept[Exception](spark.sql(s"CREATE TABLE $cat.t1 (x INT)"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the manifest history") {
    val lake = new SnapshotLake(spark, s"$root/tt")
    val v1 = lake.commit(Seq((1L, "a", "p1")).toDF("id", "name", "part"), Seq("part"))
    Thread.sleep(5)
    val tsBetween = java.time.Instant.now()
    Thread.sleep(5)
    lake.commit(Seq((1L, "a2", "p1"), (2L, "b", "p2"))
      .toDF("id", "name", "part"), Seq("part"))
    assert(spark.sql(s"SELECT name FROM $cat.tt VERSION AS OF $v1")
      .as[String].collect().toSeq == Seq("a"))
    assert(spark.sql(s"SELECT id FROM $cat.tt").as[Long].collect().toSet == Set(1L, 2L))
    val viaTs = spark.sql(
      s"SELECT name FROM $cat.tt TIMESTAMP AS OF '$tsBetween'")
      .as[String].collect().toSeq
    assert(viaTs == Seq("a"), s"timestamp between commits resolves to v1: $viaTs")
    // before the first commit: a named refusal
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.tt TIMESTAMP AS OF '2001-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("no version"), e.getMessage)
  }

  test("ALTER TABLE maps to zero-rewrite evolution: rename, widen, drop") {
    spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, cnt INT, note STRING, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO $cat.ev VALUES (1, 10, 'n1', 'p1')")
    spark.sql(s"ALTER TABLE $cat.ev RENAME COLUMN note TO title")
    spark.sql(s"ALTER TABLE $cat.ev ALTER COLUMN cnt TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.ev DROP COLUMN title")
    val t = spark.table(s"$cat.ev")
    assert(t.schema.fieldNames.toSet == Set("id", "cnt", "part"))
    assert(t.schema("cnt").dataType == org.apache.spark.sql.types.LongType)
    spark.sql(s"INSERT INTO $cat.ev VALUES (2, ${Int.MaxValue.toLong + 7L}, 'p1')")
    assert(spark.sql(s"SELECT max(cnt) FROM $cat.ev").head().getLong(0) ==
      Int.MaxValue.toLong + 7L)
    // a narrowing ALTER refuses (Spark names it before the catalog even
    // sees it; the lake's widenColumn would refuse it too)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.ev ALTER COLUMN cnt TYPE INT"))
    assert(e.getMessage.toLowerCase.contains("not supported"), e.getMessage)
  }

  test("DELETE, DROP TABLE, RENAME TABLE, SHOW TABLES") {
    spark.sql(s"CREATE TABLE $cat.d1 (id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO $cat.d1 VALUES (1, 'p1'), (2, 'p1'), (3, 'p2')")
    spark.sql(s"DELETE FROM $cat.d1 WHERE id = 2")
    assert(spark.sql(s"SELECT id FROM $cat.d1").as[Long].collect().toSet == Set(1L, 3L))
    spark.sql(s"ALTER TABLE $cat.d1 RENAME TO d2") // target is catalog-relative
    assert(spark.sql(s"SELECT count(*) FROM $cat.d2").head().getLong(0) == 2L)
    val listed = spark.sql(s"SHOW TABLES IN $cat").select("tableName")
      .as[String].collect().toSet
    assert(listed.contains("d2") && !listed.contains("d1"), s"listed: $listed")
    spark.sql(s"DROP TABLE $cat.d2")
    assert(!Files.exists(java.nio.file.Paths.get(root, "d2")))
    val e = intercept[Exception](spark.table(s"$cat.d2").collect())
    assert(e.getMessage.contains("d2"), e.getMessage)
  }

  test("catalog SELECT pushes down: partition pruning survives the catalog path") {
    spark.sql(s"CREATE TABLE $cat.pp (id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO $cat.pp VALUES (1, 'p1'), (2, 'p2')")
    val lake = new SnapshotLake(spark, s"$root/pp")
    val dirs = lake.files(Seq("part")).select("part", "file").collect()
      .map(r => r.getString(0) -> java.nio.file.Paths.get(r.getString(1)).getParent).toMap
    val pruned = spark.sql(s"SELECT id FROM $cat.pp WHERE part = 'p1'")
    // destroy p2's directory: only manifest-grain pruning can still answer
    val w = Files.walk(dirs("p2"))
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally w.close()
    assert(pruned.as[Long].collect().toSeq == Seq(1L),
      "the catalog read must prune at the manifest, not post-scan")
  }
}
