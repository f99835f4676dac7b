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
  * table is large. Integration-tested against embedded Derby
  * (JdbcSourceSpec): day-grain discovery, pushed join retrieve, and
  * filter pushdown asserted via the physical plan.
  *
  * Injection safety: identifiers and the day literal are validated before
  * interpolation — table/column names must be plain dotted identifiers and
  * the date must be ISO `yyyy-MM-dd` (the reference interpolates raw
  * strings, `wt_mssql_db.py:70-90`).
  */
object JdbcSource {

  private val IdentRe = "^[A-Za-z_][A-Za-z0-9_$.]*$".r

  private def ident(s: String): String = {
    require(IdentRe.matches(s), s"not a plain SQL identifier: '$s'")
    s
  }

  private def isoDay(s: String): java.time.LocalDate = {
    require("^\\d{4}-\\d{2}-\\d{2}$".r.matches(s), s"day literal must be ISO yyyy-MM-dd, got '$s'")
    java.time.LocalDate.parse(s)
  }

  /** Day-grain discovery (reference `query`, `wt_mssql_db.py:62-74`):
    * `SELECT CAST(ts AS DATE), COUNT(1) ... GROUP BY ...` pushed to the
    * database. The cast happens in a derived table so the GROUP BY is on a
    * plain column — portable across MS SQL, Derby, and Postgres (some
    * dialects reject expressions in GROUP BY).
    */
  def discoveryQuery(table: String, tsCol: String): String =
    s"(SELECT d AS collection_date, COUNT(1) AS n FROM " +
      s"(SELECT CAST(${ident(tsCol)} AS DATE) AS d FROM ${ident(table)}) t " +
      s"GROUP BY d) AS discovery"

  /** Full retrieve with the source-pushed equi join (J13, reference
    * `retrieve`, `wt_mssql_db.py:82-90`): history ⋈ detectors on DETID,
    * bounded to one day, day+1 computed here (not via dialect-specific
    * DATEADD). `tsLiteral` renders a timestamp literal for the target
    * dialect — default is the quoted-string form MS SQL accepts; Derby
    * needs `s => s"TIMESTAMP('$s')"`.
    */
  def retrieveQuery(
      historyTable: String, detectorTable: String,
      tsCol: String, dayLiteral: String,
      tsLiteral: String => String = s => s"'$s'"): String = {
    val day = isoDay(dayLiteral)
    val lo = tsLiteral(s"$day 00:00:00")
    val hi = tsLiteral(s"${day.plusDays(1)} 00:00:00")
    s"(SELECT a.*, b.INTNAME FROM ${ident(historyTable)} a " +
      s"JOIN ${ident(detectorTable)} b ON a.DETID = b.DETID " +
      s"WHERE a.${ident(tsCol)} >= $lo AND a.${ident(tsCol)} < $hi" +
      s") AS day_retrieve"
  }

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
