package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.JdbcSource

/** S7/J13 live against an embedded Derby database (the Spark distribution
  * ships derby jars): the reference's KITS reader semantics
  * (`drivers/devices/wt_mssql_db.py:62-109`) — day-grain discovery counts,
  * the source-pushed 2-table join bounded to one day, and Spark filter
  * pushdown into the JDBC scan.
  */
class JdbcSourceSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
  private val derbyTs = (s: String) => s"TIMESTAMP('$s')"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE SYSDETHISTORYRM (DETID INT, CURDATETIME TIMESTAMP, VOLUME INT, SPEED INT)")
      st.execute("CREATE TABLE DETECTORSRM (DETID INT, INTNAME VARCHAR(64))")
      // two detectors; 3 rows on Jan 15, 2 rows on Jan 16 (reference day grain)
      st.execute("INSERT INTO DETECTORSRM VALUES (1, 'LAMAR_KOENIG'), (2, 'BURNET_BRAKER')")
      st.execute(
        "INSERT INTO SYSDETHISTORYRM VALUES " +
          "(1, TIMESTAMP('2020-01-15 08:00:00'), 12, 35)," +
          "(1, TIMESTAMP('2020-01-15 08:15:00'), 9, 33)," +
          "(2, TIMESTAMP('2020-01-15 23:59:59'), 4, 30)," +
          "(1, TIMESTAMP('2020-01-16 00:00:00'), 7, 31)," +
          "(2, TIMESTAMP('2020-01-16 09:00:00'), 5, 29)")
      st.close()
    } finally conn.close()
  }

  test("discovery: day-grain counts computed in the database") {
    val df = JdbcSource.read(spark, url,
      JdbcSource.discoveryQuery("SYSDETHISTORYRM", "CURDATETIME"), props)
    val got = df.orderBy("collection_date")
      .select(col("collection_date").cast("string"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("2020-01-15", 3L), ("2020-01-16", 2L)))
  }

  test("retrieve: source-pushed join bounded to one day, day+1 computed portably") {
    val df = JdbcSource.read(spark, url,
      JdbcSource.retrieveQuery(
        "SYSDETHISTORYRM", "DETECTORSRM", "CURDATETIME", "2020-01-15", derbyTs))
    val rows = df.orderBy("CURDATETIME", "DETID")
      .select("DETID", "INTNAME", "VOLUME")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // exactly the Jan 15 rows, each enriched with the detector name; the
    // midnight Jan 16 row is excluded by the half-open day window
    assert(rows == Seq(
      (1, "LAMAR_KOENIG", 12), (1, "LAMAR_KOENIG", 9), (2, "BURNET_BRAKER", 4)))
  }

  test("spark filters push down to the JDBC scan") {
    val df = JdbcSource.read(spark, url,
      JdbcSource.retrieveQuery(
        "SYSDETHISTORYRM", "DETECTORSRM", "CURDATETIME", "2020-01-15", derbyTs))
      .filter(col("DETID") === 1 && col("VOLUME") > 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("DETID") && plan.contains("VOLUME"),
      s"expected JDBC filter pushdown in plan:\n$plan")
    assert(df.count() == 1)
  }

  test("parallel range partitioning splits the scan without changing results") {
    val df = JdbcSource.read(spark, url,
      JdbcSource.retrieveQuery(
        "SYSDETHISTORYRM", "DETECTORSRM", "CURDATETIME", "2020-01-15", derbyTs),
      props, partitionColumn = Some("DETID"), bounds = Some((1L, 3L)), numPartitions = 2)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 3)
  }

  test("malformed identifiers and day literals are rejected before reaching SQL") {
    intercept[IllegalArgumentException] {
      JdbcSource.retrieveQuery("t; DROP TABLE x", "d", "ts", "2020-01-15")
    }
    intercept[IllegalArgumentException] {
      JdbcSource.retrieveQuery("t", "d", "ts", "2020-01-15'; DROP TABLE x --")
    }
    intercept[IllegalArgumentException] {
      JdbcSource.discoveryQuery("t", "ts col")
    }
  }
}
