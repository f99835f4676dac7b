package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle key must name a declared
  * query (an orphaned oracle would make the driver's DuckDB compare read
  * "NO SPARK OUTPUT" and score the row failed), oracle SQL must be
  * non-empty and single-statement, and names stay in the q_ namespace.
  */
class EntryConsistencySpec extends AnyFunSuite {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("query and oracle names are q_-namespaced and unique") {
    assert(SparkEntry.queries.keys.forall(_.startsWith("q_")))
    // Map construction dedups silently; catch accidental shadowing by
    // re-counting keys per contributing module
    val all = Seq(
      QueriesRelational.queries, QueriesEvents.queries, QueriesCorpus.queries,
      QueriesExtra.queries, QueriesGsReady.queries, QueriesPerfmet.queries,
      QueriesSampling.queries, QueriesSft.queries, QueriesPrivacy.queries,
      QueriesWeb.queries, QueriesEval.queries).flatMap(_.keys)
    val dup = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dup.isEmpty, s"query name declared twice (later silently wins): ${dup.mkString(", ")}")
  }

  test("oracle SQL is non-empty and has no statement separators") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(!sql.contains(";\n") && !sql.trim.endsWith(";"),
        s"$k: oracle must be one statement (the driver runs it verbatim)")
    }
  }
}
