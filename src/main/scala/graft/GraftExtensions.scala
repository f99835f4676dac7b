package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, DotProduct, L2Norm, L2Normalize, LcsLength, RegexSpans, SequenceRatio, SquaredDistance, TokenEditDistance, UnicodeNormalize, Utf16Length}

/** Config-driven injection point for the engine's Catalyst extensions —
  * the deployment path for a cluster user who never touches graft code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs every custom expression as a native SQL function (usable from
  * `spark.sql`, views, and SQL files, not just the Scala `Column` API) and
  * registers the [[graft.plans.SequenceRatioLengthBound]] optimizer rule,
  * on EVERY session of the application — including ones created before a
  * line of user code runs (Thrift server, notebooks). [[Functions.register]]
  * remains the programmatic per-session alternative and installs the same
  * builder table, so the two paths can never drift.
  *
  * All functions are thin builders over codegen'd expressions
  * ([[graft.expressions]]) or compositions of codegen'd builtins (the geo
  * family, bridged from the `Column` API) — SQL use pays no UDF penalty
  * and stays inside whole-stage codegen, exactly like the `Column`-API
  * forms.
  *
  * The other half of the SQL-native story — TABLE resolution for the
  * snapshot lake — needs no extension at all:
  * [[graft.sources.GraftLakeProvider]] self-registers through
  * META-INF/services, so `spark.read.format("graft").load(root)` and
  * `CREATE TABLE ... USING graft` work on any session that has the graft
  * jar, extensions configured or not.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.SequenceRatioLengthBound)
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n, s"$name expects $n argument(s), got ${es.length}")
      f(es)
    }

  // bridges for SQL functions defined as Column compositions (the geo
  // family composes ~10 codegen'd builtins — re-deriving them as raw
  // catalyst trees would just duplicate Functions.scala): wrap the SQL
  // arguments as Columns, compose, unwrap. Zero runtime cost — the
  // conversion happens once at resolution.
  private def exprCol(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  private def colExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** The zoom argument must be a plan-time int constant (it shapes the
    * expression tree); foldables are evaluated, anything else refused
    * with a proper AnalysisException.
    */
  private def foldableZoom(fn: String, e: Expression): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val ok = e.foldable && (e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    })
    if (!ok) throw new org.apache.spark.sql.AnalysisException(
      "INVALID_PARAMETER_VALUE.INTEGER",
      Map("parameter" -> "`zoom`", "functionName" -> s"`$fn`",
        "invalidValue" -> e.sql))
    e.eval() match {
      case null => throw new org.apache.spark.sql.AnalysisException(
        "INVALID_PARAMETER_VALUE.INTEGER",
        Map("parameter" -> "`zoom`", "functionName" -> s"`$fn`",
          "invalidValue" -> "NULL"))
      case v: Number =>
        // validate at LONG width before narrowing — intValue() truncates,
        // so e.g. zoom = 2^32 would wrap to 0 and be silently accepted
        val l = v.longValue()
        if (l < 0L || l > 22L) throw new org.apache.spark.sql.AnalysisException(
          "INVALID_PARAMETER_VALUE.INTEGER",
          Map("parameter" -> "`zoom`", "functionName" -> s"`$fn`",
            "invalidValue" -> l.toString))
        l.toInt
    }
  }

  /** The engine's SQL function surface: (name, usage, builder). One table
    * shared by the extensions path and [[Functions.register]].
    */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("seq_ratio", "seq_ratio(a, b) - difflib-compatible Ratcliff-Obershelp similarity in [0,1]",
      arity("seq_ratio", 2)(e => SequenceRatio(e.head, e(1)))),
    ("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors",
      arity("vec_dot", 2)(e => DotProduct(e.head, e(1)))),
    ("vec_cosine", "vec_cosine(a, b) - cosine similarity, 0.0 on zero norms",
      arity("vec_cosine", 2)(e => CosineSimilarity(e.head, e(1)))),
    ("vec_sqdist", "vec_sqdist(a, b) - squared euclidean distance",
      arity("vec_sqdist", 2)(e => SquaredDistance(e.head, e(1)))),
    ("vec_norm", "vec_norm(a) - L2 norm",
      arity("vec_norm", 1)(e => L2Norm(e.head))),
    ("vec_normalize", "vec_normalize(a) - unit-normalize; zero vectors pass through",
      arity("vec_normalize", 1)(e => L2Normalize(e.head))),
    ("unicode_nfc", "unicode_nfc(s) - Unicode NFC normalization",
      arity("unicode_nfc", 1)(e => UnicodeNormalize(e.head, "NFC"))),
    ("unicode_nfkc", "unicode_nfkc(s) - Unicode NFKC normalization",
      arity("unicode_nfkc", 1)(e => UnicodeNormalize(e.head, "NFKC"))),
    ("utf16_length", "utf16_length(s) - string length in UTF-16 code units (Java/Python len)",
      arity("utf16_length", 1)(e => Utf16Length(e.head))),
    ("lcs_len", "lcs_len(a, b) - longest common subsequence length of two array<string>",
      arity("lcs_len", 2)(e => LcsLength(e.head, e(1)))),
    ("token_edit_distance", "token_edit_distance(a, b) - Levenshtein distance between two array<string> token sequences",
      arity("token_edit_distance", 2)(e => TokenEditDistance(e.head, e(1)))),
    ("haversine_feet", "haversine_feet(lat1, lon1, lat2, lon2) - great-circle distance in feet",
      arity("haversine_feet", 4)(e => colExpr(
        Functions.haversineFeet(exprCol(e.head), exprCol(e(1)), exprCol(e(2)), exprCol(e(3)))))),
    ("tile_x", "tile_x(lon, zoom) - OSM slippy-map tile x at the (constant) zoom",
      arity("tile_x", 2)(e => colExpr(
        Functions.tileX(exprCol(e.head), foldableZoom("tile_x", e(1)))))),
    ("tile_y", "tile_y(lat, zoom) - OSM slippy-map tile y at the (constant) zoom",
      arity("tile_y", 2)(e => colExpr(
        Functions.tileY(exprCol(e.head), foldableZoom("tile_y", e(1)))))),
    ("intersection_id", "intersection_id(lon, lat) - SharedStreets-style md5 of the typed lon-lat message",
      arity("intersection_id", 2)(e => colExpr(
        Functions.intersectionId(exprCol(e.head), exprCol(e(1)))))),
    ("regex_spans", "regex_spans(s, pattern) - non-overlapping match spans as array<struct<start, end>> (UTF-16 units; pattern must fold to a string constant)",
      arity("regex_spans", 2)(e => {
        // any foldable string expression works ('a' || 'b', CAST of a
        // literal, ...) — it is constant at plan time, which is all the
        // pre-compiled RegexSpans needs; non-constant patterns get a proper
        // AnalysisException, not a raw IllegalArgumentException
        import org.apache.spark.sql.types.StringType
        def refuse(why: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            "INVALID_PARAMETER_VALUE.PATTERN",
            Map("parameter" -> "`pattern`", "functionName" -> "`regex_spans`",
              "value" -> why))
        val pat = e(1)
        if (pat.foldable && pat.dataType == StringType) {
          pat.eval() match {
            case p: org.apache.spark.unsafe.types.UTF8String => RegexSpans(e.head, p.toString)
            case null => refuse("NULL (the pattern must not be null)")
          }
        } else refuse(
          s"${pat.sql} (must be a foldable string expression, constant at plan time)")
      })))
}
