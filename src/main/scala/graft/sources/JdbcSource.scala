package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — JDBC source (reference `drivers/devices/wt_mssql_db.py:62-109`,
  * the KITS MS SQL reader). The reference hand-pushes its day-grain
  * discovery aggregate and its 2-table join into SQL strings; Spark's JDBC
  * source does the same through a `dbtable` subquery, and `filter`s on the
  * result push down as WHERE clauses.
  *
  * Scale note: `partitionColumn`/`numPartitions` turn the single-cursor
  * read into parallel range scans — the knob that matters when the source
  * table is large. (No database ships in this environment; the spec for
  * this module exercises query construction only.)
  */
object JdbcSource {

  /** Day-grain discovery (reference `query`, `wt_mssql_db.py:62-74`):
    * `SELECT CAST(ts AS DATE) d, COUNT(1) n ... GROUP BY CAST(ts AS DATE)`
    * pushed to the database.
    */
  def discoveryQuery(table: String, tsCol: String): String =
    s"(SELECT CAST($tsCol AS DATE) AS collection_date, COUNT(1) AS n " +
      s"FROM $table GROUP BY CAST($tsCol AS DATE)) AS discovery"

  /** Full retrieve with the source-pushed equi join (J13, reference
    * `retrieve`, `wt_mssql_db.py:82-90`): history ⋈ detectors on DETID,
    * bounded to one day, ordered.
    */
  def retrieveQuery(
      historyTable: String, detectorTable: String,
      tsCol: String, dayLiteral: String): String =
    s"(SELECT a.*, b.INTNAME FROM $historyTable a JOIN $detectorTable b " +
      s"ON a.DETID = b.DETID " +
      s"WHERE a.$tsCol >= '$dayLiteral' AND a.$tsCol < DATEADD(day, 1, '$dayLiteral') " +
      s") AS day_retrieve"

  /** Generic reader: a dbtable subquery with optional parallel range
    * partitioning.
    */
  def read(
      spark: SparkSession,
      url: String,
      dbtable: String,
      props: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
    props.foreach { case (k, v) => r = r.option(k, v) }
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => ()
    }
    r.load()
  }
}
