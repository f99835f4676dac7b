package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-shaped audit a
  * 100 TB ingest gate runs BEFORE publishing a batch: not-null, range,
  * accepted-values, pattern, uniqueness, and referential integrity, each
  * reported as `(check_id, check_type, target, violations, total, passed)`.
  *
  * Scale shape: every ROW-LOCAL check compiles to one conditional-sum
  * aggregate expression and ALL of them run in a SINGLE scan of the table
  * (uniqueness rides the same aggregate as a `count distinct` over a
  * null-safe canonical key). Only referential-integrity checks add work —
  * one left-anti join against the (deduplicated, typically broadcastable)
  * referenced key set each. Nothing is collected per row; the report is
  * O(checks) rows.
  *
  * Null semantics follow SQL constraint practice: `NotNull` is the ONLY
  * check a NULL can fail — range/accepted/pattern checks pass NULLs (flag
  * absence separately, don't double-count it), and a foreign key with any
  * NULL component passes (the SQL "simple match" rule).
  *
  * Reference analog: the ad-hoc per-feed sanity asserts scattered through
  * the reference's ETL scripts (row counts, date windows — e.g.
  * `atd_data_lake/etl_app.py` arg validation); here they are one declared,
  * oracle-checkable relation.
  */
object Validate {

  sealed trait Check {
    def id: String
    def checkType: String
    def target: String
  }

  /** `column` must be non-null. */
  final case class NotNull(column: String) extends Check {
    def id = s"not_null($column)"; def checkType = "not_null"; def target = column
  }

  /** Non-null values of `column` must lie in `[lo, hi]`. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    def id = s"in_range($column)"; def checkType = "in_range"; def target = column
  }

  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    def id = s"accepted($column)"; def checkType = "accepted"; def target = column
  }

  /** Non-null values of `column` must match `regex` (Java regex, `rlike`
    * semantics — keep patterns in the RE2-compatible subset if an external
    * engine must re-run the suite).
    */
  final case class Matches(column: String, regex: String) extends Check {
    def id = s"matches($column)"; def checkType = "matches"; def target = column
  }

  /** `columns` must be row-unique. Violations = rows beyond the first of
    * each duplicated key (`count(*) − count(distinct key)`); NULL
    * components participate via a sentinel so two (1, NULL) rows DO
    * collide.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    def id = s"unique(${columns.mkString(",")})"
    def checkType = "unique"; def target = columns.mkString(",")
  }

  /** Every row whose `columns` are all non-null must have a match in
    * `ref`'s `refColumns`. `refName` only labels the report.
    */
  final case class ForeignKey(
      columns: Seq[String],
      refName: String,
      ref: DataFrame,
      refColumns: Seq[String]) extends Check {
    require(columns.nonEmpty && columns.length == refColumns.length,
      "ForeignKey needs matching non-empty column lists")
    def id = s"fk(${columns.mkString(",")}->$refName)"
    def checkType = "foreign_key"; def target = columns.mkString(",")
  }

  /** Null-safe canonical key for uniqueness: NULL → <NUL> sentinel,
    * components joined by <SOH>. (A value containing the separators could
    * alias — acceptable for an audit; hash the key upstream if adversarial
    * data is in scope.)
    */
  private def uniqueKey(columns: Seq[String]): Column =
    concat_ws("\u0001",
      columns.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)

  private def violationExpr(c: Check): Column = c match {
    case NotNull(column) => col(column).isNull
    case InRange(column, lo, hi) =>
      col(column).isNotNull && (col(column) < lo || col(column) > hi)
    case AcceptedValues(column, values) =>
      col(column).isNotNull && !col(column).isin(values: _*)
    case Matches(column, regex) =>
      col(column).isNotNull && !col(column).rlike(regex)
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  /** Run the suite: one report row per check, `(check_id, check_type,
    * target, violations, total, passed)`, ordered as declared.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.id).distinct.length == checks.length,
      s"duplicate check ids in ${checks.map(_.id)}")
    val rowLocal = checks.filter {
      case _: ForeignKey => false
      case _ => true
    }
    // ONE aggregate for every row-local check: conditional sums + one
    // count-distinct per Unique, all over the same scan.
    val aggExprs: Seq[Column] = rowLocal.map {
      case u: Unique =>
        (count(lit(1)) - count_distinct(uniqueKey(u.columns))).as(u.id)
      case c =>
        sum(when(violationExpr(c), 1L).otherwise(0L)).as(c.id)
    }
    val declaredOrd = checks.map(_.id).zipWithIndex.toMap
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val agg = df.agg(count(lit(1)).as("_total"), aggExprs: _*)
        val rows = array(rowLocal.map { c =>
          struct(
            lit(declaredOrd(c.id)).as("_ord"),
            lit(c.id).as("check_id"),
            lit(c.checkType).as("check_type"),
            lit(c.target).as("target"),
            coalesce(col(s"`${c.id}`"), lit(0L)).as("violations"),
            col("_total").as("total"))
        }: _*)
        Some(agg.select(explode(rows).as("r")).select("r.*"))
      }

    // bounded: one scalar per suite, computed only when an FK check needs it
    lazy val total = df.count()
    val fkReports: Seq[DataFrame] = checks.collect { case fk: ForeignKey =>
      val keys = fk.columns.zip(fk.refColumns)
      val left = df
        .filter(fk.columns.map(col(_).isNotNull).reduce(_ && _))
        .select(fk.columns.map(col): _*)
      val right = fk.ref
        .select(keys.map { case (c, rc) => col(rc).as(c) }: _*)
        .distinct()
      left
        .join(right, fk.columns, "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(
          lit(declaredOrd(fk.id)).as("_ord"),
          lit(fk.id).as("check_id"),
          lit(fk.checkType).as("check_type"),
          lit(fk.target).as("target"),
          col("violations"),
          lit(total).as("total"))
    }

    // the report is O(checks) rows, so the declared-order sort costs nothing
    val all = (localReport.toSeq ++ fkReports).reduce(_ unionByName _)
    all.withColumn("passed", col("violations") === 0L)
      .orderBy("_ord").drop("_ord")
  }
}
