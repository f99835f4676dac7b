package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** The pure-SQL lake surface: `spark.read.format("graft")` / `CREATE TABLE
  * ... USING graft` resolve through the API's readEntries seam, so column
  * mapping, type widening, deletion vectors, and time travel all arrive
  * for free.
  */
class GraftLakeProviderSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (SnapshotLake, String) = {
    val root = Files.createTempDirectory("graft_dsv2").toString
    (new SnapshotLake(spark, root), root)
  }

  private def seed(lake: SnapshotLake): Long =
    lake.commit(
      Seq((1L, "a", 10, "p1"), (2L, "b", 20, "p1"), (3L, "c", 30, "p2"))
        .toDF("id", "name", "cnt", "part"),
      Seq("part"))

  test("format(\"graft\") reads the latest snapshot, identical to the API read") {
    val (lake, root) = fresh()
    seed(lake)
    val api = lake.read(Seq("part"))
    val dsv2 = spark.read.format("graft").load(root)
    assert(dsv2.schema == api.schema)
    assert(dsv2.collect().toSet == api.collect().toSet)
    // partition columns came from the lake's own meta — no option needed
    assert(lake.partitionColumns().contains(Seq("part")))
  }

  test("renames + widening + deletion vectors all surface through pure SQL; time travel via option") {
    import org.apache.spark.sql.types._
    val (lake, root) = fresh()
    val v1 = seed(lake)
    lake.renameColumn("name", "title")
    lake.widenColumn("cnt", "bigint")
    lake.commit(Seq((4L, "d", Int.MaxValue.toLong + 5L, "p3"))
      .toDF("id", "title", "cnt", "part"), Seq("part"))
    lake.deleteWhereDv(col("id") === 2L, Seq("part"))

    spark.read.format("graft").load(root).createOrReplaceTempView("lake_latest")
    val got = spark.sql(
      "SELECT id, title, cnt FROM lake_latest ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 10L), (3L, "c", 30L),
      (4L, "d", Int.MaxValue.toLong + 5L)),
      s"mapping+widen+DV must all apply through SQL, got $got")
    assert(spark.table("lake_latest").schema("cnt").dataType == LongType)

    // time travel: the pre-evolution snapshot under its own names/types
    val old = spark.read.format("graft").option("version", v1).load(root)
    assert(old.schema.fieldNames.toSet == Set("id", "name", "cnt", "part"))
    assert(old.schema("cnt").dataType == IntegerType)
    assert(old.count() == 3L)

    // CREATE TABLE ... USING graft: the catalog form of the same surface
    spark.sql(s"CREATE TABLE graft_lake_t USING graft OPTIONS (path '$root')")
    try {
      val viaTable = spark.sql("SELECT id, title, cnt FROM graft_lake_t ORDER BY id")
        .as[(Long, String, Long)].collect().toSeq
      assert(viaTable == got, "the catalog table must read the same rows")
    } finally spark.sql("DROP TABLE graft_lake_t")
  }

  test("catalog table tracks lake evolution live: drops vanish, widens surface") {
    import org.apache.spark.sql.types._
    // supportsExternalMetadata = false means Spark re-infers the schema at
    // every resolution — a catalog table can never go stale against the
    // evolving lake (the V1Scan bridge ALSO carries a defensive
    // lossless-or-refuse alignment for any path that does hand it a stored
    // schema)
    val (lake, root) = fresh()
    seed(lake)
    spark.sql(s"CREATE TABLE graft_evo_t USING graft OPTIONS (path '$root')")
    try {
      assert(spark.table("graft_evo_t").columns.toSet == Set("id", "name", "cnt", "part"))
      // a column dropped AFTER create disappears from the table schema
      lake.dropColumn("name")
      assert(spark.table("graft_evo_t").columns.toSet == Set("id", "cnt", "part"))
      val e = intercept[Exception](spark.sql("SELECT name FROM graft_evo_t").collect())
      assert(e.getMessage.contains("name"), "the dropped column resolves nowhere")
      // a widen AFTER create surfaces live: wide type, beyond-int values land
      lake.widenColumn("cnt", "bigint")
      lake.commit(Seq((9L, Int.MaxValue.toLong + 3L, "p9")).toDF("id", "cnt", "part"),
        Seq("part"))
      val got = spark.sql("SELECT id, cnt FROM graft_evo_t ORDER BY id")
      assert(got.schema("cnt").dataType == LongType)
      assert(got.as[(Long, Long)].collect().toSeq.last == ((9L, Int.MaxValue.toLong + 3L)))
    } finally spark.sql("DROP TABLE graft_evo_t")
  }

  test("merge-on-read upsert is visible through SQL (DVs + appended rows in one read)") {
    val (lake, root) = fresh()
    seed(lake)
    lake.upsertDv(
      Seq((2L, "b2", 21, 2L, "p1"), (9L, "z", 90, 2L, "p9"))
        .toDF("id", "name", "cnt", "ver", "part")
        .withColumn("ver", col("ver").cast("long")),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val got = spark.read.format("graft").load(root)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c"), (9L, "z")))
  }

  test("SQL writes: INSERT INTO appends rows, INSERT OVERWRITE replaces partitions") {
    val (lake, root) = fresh()
    seed(lake)
    spark.sql(s"CREATE TABLE graft_w_t USING graft OPTIONS (path '$root')")
    try {
      // INSERT INTO = true row-append: existing p1 rows survive
      spark.sql("INSERT INTO graft_w_t VALUES (4, 'd', 40, 'p1'), (5, 'e', 50, 'p3')")
      val afterInsert = spark.sql("SELECT id FROM graft_w_t").as[Long].collect().toSet
      assert(afterInsert == Set(1L, 2L, 3L, 4L, 5L),
        s"INSERT INTO must append, never replace: $afterInsert")
      // INSERT OVERWRITE = partition replace: only touched partitions change
      spark.sql("INSERT OVERWRITE graft_w_t VALUES (9, 'z', 90, 'p1')")
      val afterOw = spark.sql("SELECT id, part FROM graft_w_t")
        .as[(Long, String)].collect().toSet
      assert(afterOw == Set((9L, "p1"), (3L, "p2"), (5L, "p3")),
        s"OVERWRITE replaces p1 wholesale, leaves p2/p3 untouched: $afterOw")
      // the DataFrame API rides the same seam
      Seq((10L, "y", 100, "p2")).toDF("id", "name", "cnt", "part")
        .write.format("graft").mode("append").save(root)
      assert(spark.sql("SELECT count(*) FROM graft_w_t").head().getLong(0) == 4L)
    } finally spark.sql("DROP TABLE graft_w_t")
    // a time-travel table refuses writes
    val v = lake.latestVersion.get
    spark.sql(s"CREATE TABLE graft_w_tt USING graft OPTIONS (path '$root', version '$v')")
    try {
      val e = intercept[Exception](
        spark.sql("INSERT INTO graft_w_tt VALUES (99, 'x', 1, 'p1')"))
      assert(e.getMessage.contains("time-travel"), e.getMessage)
    } finally spark.sql("DROP TABLE graft_w_tt")
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally w.close()
    }

  private def dirsByPart(lake: SnapshotLake): Map[String, java.nio.file.Path] =
    lake.files(Seq("part")).select("part", "file").collect()
      .map(r => r.getString(0) -> java.nio.file.Paths.get(r.getString(1)).getParent)
      .toMap

  test("pushdown: partition-equality SQL filter physically reads ONLY the matching directory") {
    val (lake, root) = fresh()
    seed(lake) // p1: ids 1,2 — p2: id 3
    val dirs = dirsByPart(lake)
    // plan BOTH frames while every file still exists (schema inference
    // opens footers across the lake), then destroy the non-p1 directories:
    // a scan that still lists them dies, the pruned one never looks
    val pruned = spark.read.format("graft").load(root)
      .filter(col("part") === "p1").select("id", "name")
    val unpruned = spark.read.format("graft").load(root).select("id", "name")
    // IN-list and negation prune too
    val inList = spark.read.format("graft").load(root)
      .filter(col("part").isin("p1") && !(col("part") === "p2")).select("id")
    dirs.filterNot(_._1 == "p1").values.foreach(deleteTree)
    assert(pruned.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")),
      "the partition filter must select manifest entries before any file opens")
    intercept[Exception](unpruned.collect()) // proves the deletion was real
    assert(inList.as[Long].collect().toSet == Set(1L, 2L))
  }

  test("pushdown: manifest dir-stats skip directories a numeric conjunct excludes") {
    val (lake, root) = fresh()
    seed(lake) // p1: cnt {10, 20} — p2: cnt {30}
    val dirs = dirsByPart(lake)
    val skipped = spark.read.format("graft").load(root)
      .filter(col("cnt") >= 25).select("id", "cnt")
    deleteTree(dirs("p1")) // stats prove p1 (max cnt 20) cannot match
    assert(skipped.as[(Long, Int)].collect().toSet == Set((3L, 30)),
      "dir stats must exclude p1 without opening it")
  }

  test("pushdown: required columns reach the scan schema; results equal the API read") {
    val (lake, root) = fresh()
    seed(lake)
    val narrow = spark.read.format("graft").load(root).select("name")
    val leaf = narrow.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("name"),
      s"column pruning must reach the scan, got ${leaf.output}")
    assert(narrow.as[String].collect().toSet == Set("a", "b", "c"))
    // pushed filters surface in the physical plan
    val filtered = spark.read.format("graft").load(root)
      .filter(col("part") === "p1" && col("cnt") > 15)
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") && planStr.contains("part"),
      s"pushed filters must be visible in the plan:\n$planStr")
    // and the filtered SQL read equals the filtered API read exactly
    val api = lake.read(Seq("part"))
      .filter(col("part") === "p1" && col("cnt") > 15).collect().toSet
    assert(filtered.collect().toSet == api)
    // empty survivor set: correct empty result, schema intact
    val none = spark.read.format("graft").load(root).filter(col("part") === "nope")
    assert(none.collect().isEmpty && none.columns.contains("cnt"))
  }

  test("COUNT(*) pushdown: answered from parquet footers, zero data columns read") {
    val (lake, root) = fresh()
    seed(lake)
    val cnt = spark.read.format("graft").load(root).groupBy().count()
    // complete pushdown: the scan's output IS the count — no data column,
    // no aggregate node above it
    val plan = cnt.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]") &&
      !plan.contains("HashAggregate"),
      s"count must push to the scan (footer row counts):\n$plan")
    assert(cnt.head().getLong(0) == 3L)
    // GROUP BY a partition column: per-dir footer sums + manifest values
    val byPart = spark.read.format("graft").load(root)
      .groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPart == Map("p1" -> 2L, "p2" -> 1L))
    // a pending DV makes footer counts wrong — pushdown must DECLINE
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    val cntDv = spark.read.format("graft").load(root).groupBy().count()
    val planDv = cntDv.queryExecution.executedPlan.toString
    assert(!planDv.contains("PushedAggregates"),
      s"with DVs pending the normal DV-aware scan must run:\n$planDv")
    assert(cntDv.head().getLong(0) == 2L, "and the DV-aware count is exact")
    // a WHERE clause declines too (filters are post-scan here)
    assert(spark.read.format("graft").load(root)
      .filter(col("part") === "p1").count() == 1L)
  }

  test("SQL DELETE FROM: deletion-vector delete, time travel intact, named refusals") {
    val (lake, root) = fresh()
    val v1 = seed(lake)
    spark.sql(s"CREATE TABLE graft_d_t USING graft OPTIONS (path '$root')")
    try {
      spark.sql("DELETE FROM graft_d_t WHERE id = 2 OR cnt > 25")
      assert(spark.sql("SELECT id FROM graft_d_t").as[Long].collect().toSet == Set(1L),
        "DV delete through SQL must remove exactly the matching rows")
      // zero rewrite: the delete stacked a DV, data files survive for time travel
      val old = spark.read.format("graft").option("version", v1).load(root)
      assert(old.count() == 3L, "time travel before the DELETE sees every row")
      // ≡ the API path on an identical lake
      val (lake2, _) = fresh()
      seed(lake2)
      lake2.deleteWhereDv(col("id") === 2L || col("cnt") > 25, Seq("part"))
      assert(spark.table("graft_d_t").collect().toSet ==
        lake2.read(Seq("part")).collect().toSet)
      // UPDATE / MERGE INTO are refused by name at analysis time
      val eU = intercept[Exception](
        spark.sql("UPDATE graft_d_t SET name = 'x' WHERE id = 1"))
      assert(eU.getMessage.toLowerCase.contains("update"), eU.getMessage)
      val eM = intercept[Exception](spark.sql(
        """MERGE INTO graft_d_t USING (SELECT 1 AS id) s ON graft_d_t.id = s.id
          |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(eM.getMessage.toLowerCase.contains("merge"), eM.getMessage)
    } finally spark.sql("DROP TABLE graft_d_t")
    // DELETE on a time-travel table: the NAMED refusal
    spark.sql(s"CREATE TABLE graft_d_tt USING graft OPTIONS (path '$root', version '$v1')")
    try {
      val e = intercept[Exception](spark.sql("DELETE FROM graft_d_tt WHERE id = 1"))
      assert(e.getMessage.contains("time-travel"), e.getMessage)
    } finally spark.sql("DROP TABLE graft_d_tt")
  }

  test("refusals: missing path, pre-feature lake without partitionCols, explicit override") {
    val e1 = intercept[Exception](
      spark.read.format("graft").load())
    assert(e1.getMessage.contains("path"), e1.getMessage)
    // a lake whose meta predates partcols: strip the key by hand
    val (lake, root) = fresh()
    seed(lake)
    val mdir = java.nio.file.Paths.get(root, "manifests")
    val mf = Files.list(mdir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .maxBy(_.getFileName.toString)
    val stripped = new String(Files.readAllBytes(mf), "UTF-8")
      .linesIterator.filterNot(_.contains("partcols")).mkString("\n")
    Files.write(mf, stripped.getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      spark.read.format("graft").load(root).collect())
    assert(e2.getMessage.contains("partitionCols"), e2.getMessage)
    // the explicit option unblocks it
    val got = spark.read.format("graft").option("partitionCols", "part").load(root)
    assert(got.count() == 3L)
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
