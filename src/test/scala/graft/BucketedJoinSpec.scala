package graft


import org.apache.spark.sql.functions._

/** The co-located join story for 100 TB (NOTES / SURVEY §4): persisting both
  * sides bucketed on the join key lets Spark join with NO exchange — the
  * shuffle that dominates a petabyte-scale J1/J2 disappears at write time.
  * local[] + the in-memory catalog support bucketed tables, so the plan
  * shape is assertable here.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); the in-memory catalog forgets tables across JVMs while
    // the directories persist, so clear both before writing
    Seq("orders_b", "lineitem_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = java.nio.file.Paths.get("spark-warehouse", tbl)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
    }

    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables(spark, dir, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // MERGE hint forces a sort-merge join without touching the shared
    // session's broadcast threshold (suites run in parallel on one session)
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b").hint("MERGE"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume the bucketed distribution directly: no
    // shuffle before the SortMergeJoin (the groupBy above it may exchange)
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side shuffled:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum == 6000L)
  }

  test("bucketed J1: the incremental diff joins co-located, zero exchanges") {
    // The engine's core loop at 100 TB: catalog (target) and source listing
    // both persisted bucketed on the item key — the nightly diff's LEFT
    // ANTI sort-merge join then runs with NO shuffle on either side.
    Seq("diff_src_b", "diff_tgt_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = java.nio.file.Paths.get("spark-warehouse", tbl)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
    }

    val dir = "/root/testdata/sf0.001"
    val src = Tables(spark, dir, "orders").select(
      col("o_orderkey").as("id_base"),
      lit("f.txt").as("id_ext"),
      col("o_orderdate").as("collection_date"),
      lit(null).cast("timestamp").as("collection_end"))
    // target: every 3rd item already processed
    val tgt = src.filter(col("id_base") % 3 === 0)
    // bucket columns must EQUAL the diff's equi-key set: Spark (with the
    // default requireAllClusterKeysForCoPartition) only elides the exchange
    // when the join keys and bucket keys match exactly
    src.write.mode("overwrite").bucketBy(8, "id_base", "id_ext")
      .sortBy("id_base", "id_ext").saveAsTable("diff_src_b")
    tgt.write.mode("overwrite").bucketBy(8, "id_base", "id_ext")
      .sortBy("id_base", "id_ext").saveAsTable("diff_tgt_b")

    val diff = graft.incr.IncrementalDiff.diff(
      spark.table("diff_src_b"),
      spark.table("diff_tgt_b").hint("MERGE"),
      Seq("id_base", "id_ext"), "collection_date", Some("collection_end"))

    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
      s"expected anti SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected zero exchanges on the bucketed diff:\n$plan")
    // correctness unchanged vs the unbucketed diff
    val expected = graft.incr.IncrementalDiff.diff(
      src, tgt, Seq("id_base", "id_ext"), "collection_date", Some("collection_end"))
      .select("id_base").collect().map(_.getLong(0)).toSet
    assert(diff.select("id_base").collect().map(_.getLong(0)).toSet == expected)
    assert(expected.nonEmpty)
  }
}
