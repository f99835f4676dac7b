package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Privacy

/** Privacy-gating coverage: k-anonymity suppression, l-diversity reporting,
  * and the composed release gate over events — quasi-identifiers are
  * (event_type, 50-wide value bucket), sensitive attribute is user_id.
  */
object QueriesPrivacy {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** events projected to (event_id, quasi..., user_id) with the
    * generalized value bucket. */
  private def rows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        Privacy.generalize(col("value"), 50.0).as("vbucket"),
        col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pv_kanon" -> ((s, dir) =>
      Privacy.kAnonymity(rows(s, dir), Seq("event_type", "vbucket"), k = 50L)
        .select("event_id", "event_type", "vbucket", "group_n", "suppress")),

    "q_pv_ldiv" -> ((s, dir) =>
      Privacy.lDiversity(rows(s, dir), Seq("event_type", "vbucket"), "user_id", l = 50L)),

    "q_pv_gate" -> ((s, dir) =>
      Privacy.releaseGate(rows(s, dir), Seq("event_type", "vbucket"), "user_id",
        k = 50L, l = 60L)
        .select("event_id", "event_type", "vbucket", "group_n", "n_sensitive", "keep")))

  private val rowsSql =
    """SELECT event_id, event_type,
      |    floor(CAST(value AS DOUBLE) / 50.0) * 50.0 AS vbucket,
      |    user_id
      |  FROM events""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pv_kanon" ->
      s"""WITH r AS ($rowsSql),
         |g AS (SELECT event_type, vbucket, count(*) AS group_n
         |  FROM r GROUP BY 1, 2)
         |SELECT r.event_id, r.event_type, r.vbucket, g.group_n,
         |  g.group_n < 50 AS suppress
         |FROM r JOIN g ON r.event_type IS NOT DISTINCT FROM g.event_type
         |  AND r.vbucket IS NOT DISTINCT FROM g.vbucket""".stripMargin,

    "q_pv_ldiv" ->
      s"""WITH r AS ($rowsSql)
         |SELECT event_type, vbucket, count(*) AS group_n,
         |  count(DISTINCT user_id) AS n_sensitive,
         |  count(DISTINCT user_id) >= 50 AS diverse
         |FROM r GROUP BY 1, 2""".stripMargin,

    "q_pv_gate" ->
      s"""WITH r AS ($rowsSql),
         |g AS (SELECT event_type, vbucket, count(*) AS group_n,
         |    count(DISTINCT user_id) AS n_sensitive
         |  FROM r GROUP BY 1, 2)
         |SELECT r.event_id, r.event_type, r.vbucket, g.group_n, g.n_sensitive,
         |  (g.group_n >= 50 AND g.n_sensitive >= 60) AS keep
         |FROM r JOIN g ON r.event_type IS NOT DISTINCT FROM g.event_type
         |  AND r.vbucket IS NOT DISTINCT FROM g.vbucket""".stripMargin)
}
