package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.apps.{EtlRun, Pipelines}
import graft.catalog.LakeCatalog
import graft.sinks.Sinks
import graft.sources.JdbcSource

/** The Wavetronix pipeline end to end against a live (embedded Derby)
  * KITS-shaped database, mirroring the reference's actual wt flow
  * (`wt_mssql_db.py` → `wt_json_standard.py` → `wt_ready.py` →
  * `wt_extract_soc.py`): JDBC day-grain discovery lists candidate days, the
  * catalog gate picks the novel ones, each processes through the pushed
  * retrieve join → standardize → ready → publish → lake write; reruns are
  * no-ops and a new day in the database processes incrementally.
  */
class WtEndToEndSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftwte2e;create=true"
  private val derbyTs = (s: String) => s"TIMESTAMP('$s')"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE SYSDETHISTORYRM (DETID INT, INTID BIGINT, CURDATETIME TIMESTAMP, " +
          "VOLUME INT, OCCUPANCY INT, SPEED INT, DETNAME VARCHAR(32))")
      st.execute("CREATE TABLE DETECTORSRM (DETID INT, INTNAME VARCHAR(64))")
      st.execute("INSERT INTO DETECTORSRM VALUES (1, 'LAMAR_KOENIG'), (2, 'LAMAR_KOENIG')")
      st.execute(
        "INSERT INTO SYSDETHISTORYRM VALUES " +
          "(1, 100, TIMESTAMP('2020-01-15 02:00:00'), 12, 3, 35, 'NB_1')," +
          "(2, 100, TIMESTAMP('2020-01-15 02:15:00'), 7, 2, 33, 'SB_1')," +
          "(1, 100, TIMESTAMP('2020-01-16 03:00:00'), 9, 2, 31, 'NB_1')")
      st.close()
    } finally conn.close()
  }

  private def insertDay17(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "INSERT INTO SYSDETHISTORYRM VALUES " +
          "(2, 100, TIMESTAMP('2020-01-17 04:00:00'), 4, 1, 29, 'SB_1')")
      st.close()
    } finally conn.close()
  }

  test("nightly wt run: JDBC discovery -> catalog gate -> retrieve -> publish") {
    val lakeDir = Files.createTempDirectory("graft_wt_lake_").toString
    val catDir = Files.createTempDirectory("graft_wt_cat_").toString
    val cat = new LakeCatalog(spark, catDir)
    val unitData = Seq((100L, 77, "LAMAR_KOENIG", "LOC_1"))
      .toDF("kits_id", "atd_device_id", "device_name", "atd_location_id")

    var published = Vector.empty[Long]
    def nightly(): Long = {
      // discovery: day-grain counts computed in the database (S7/A2)
      val items = JdbcSource
        .read(spark, url, JdbcSource.discoveryQuery("SYSDETHISTORYRM", "CURDATETIME"))
        .select(
          lit("kits").as("id_base"), lit("counts").as("id_ext"),
          col("collection_date").cast("timestamp").as("collection_date"))
      EtlRun.run(spark, items, cat, "ready", "wt",
        today = lit("2020-06-01").cast("date")) { todo =>
        val days = todo.select(col("collection_date").cast("date").cast("string"))
          .as[String].collect().sorted
        days.foreach { day =>
          // retrieve: the source-pushed 2-table join bounded to the day (J13)
          val raw = JdbcSource.read(spark, url,
            JdbcSource.retrieveQuery(
              "SYSDETHISTORYRM", "DETECTORSRM", "CURDATETIME", day, derbyTs))
            .select(
              col("DETID").as("detID"), col("INTID").as("intID"),
              // Derby returns the instant; the reference's CSV carries local
              // wall-clock strings — format to the same shape for standardize
              date_format(col("CURDATETIME"), "yyyy-MM-dd HH:mm:ss").as("curDateTime"),
              col("INTNAME").as("intName"), col("DETNAME").as("detName"),
              col("VOLUME").as("volume"), col("OCCUPANCY").as("occupancy"),
              col("SPEED").as("speed"))
          val ready = Pipelines.Wt.ready(Pipelines.Wt.standardize(raw), unitData)
          val pub = Pipelines.Wt.publish(ready)
          published :+= pub.count()
          Sinks.writeLake(ready, "timestamp", "wt", lakeDir, mode = "append")
        }
      }
    }

    // night 1: both days discovered and processed
    assert(nightly() == 2)
    assert(published.sum == 3)
    val lake = spark.read.parquet(lakeDir)
    assert(lake.count() == 3)
    assert(lake.select("device_id").distinct().count() == 1) // one surrogate

    // night 2: nothing new
    assert(nightly() == 0)
    assert(spark.read.parquet(lakeDir).count() == 3)

    // a new day lands in KITS: only it processes
    insertDay17()
    assert(nightly() == 1)
    assert(published.last == 1)
    assert(spark.read.parquet(lakeDir).count() == 4)
    assert(cat.query("ready", dataSource = Some("wt")).count() == 3)
  }
}
