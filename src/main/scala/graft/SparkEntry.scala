package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the training-data
  * extensions) is declared here as a named query over the synthetic tables,
  * with an equivalent DuckDB oracle where ANSI SQL can express it. Query
  * bodies live in [[QueriesRelational]], [[QueriesEvents]], and
  * [[QueriesCorpus]]; the operator implementations live under `graft.ops`,
  * `graft.incr`, and `graft.catalog`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship tumbling-bucket aggregation (SURVEY A1) over lineitem:
    * daily buckets × return flag → volume, mean/std quantity. (lineitem
    * rather than events so the smoke check is independent of the session's
    * parquet-nanos configuration; `q_a1_traffic15` is the events variant.)
    */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.TrafficAgg.aggregate(
      Tables(spark, "/root/testdata/sf0.001", "lineitem"),
      "l_shipdate", Seq("l_returnflag"), Seq("l_quantity"), freqSeconds = 86400)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesEvents.queries ++ QueriesCorpus.queries ++
      QueriesExtra.queries ++ QueriesGsReady.queries ++ QueriesPerfmet.queries ++
      QueriesSampling.queries ++ QueriesSft.queries ++ QueriesPrivacy.queries ++
      QueriesWeb.queries ++ QueriesEval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get the driver's weaker rows-only
    * check.
    */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracles ++ QueriesEvents.oracles ++ QueriesCorpus.oracles ++
      QueriesExtra.oracles ++ QueriesGsReady.oracles ++ QueriesPerfmet.oracles ++
      QueriesSampling.oracles ++ QueriesSft.oracles ++ QueriesPrivacy.oracles ++
      QueriesWeb.oracles ++ QueriesEval.oracles
}
