package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.{CosineSimilarity, DotProduct, L2Norm, L2Normalize, SequenceRatio, SquaredDistance, UnicodeNormalize}

/** The engine's scalar-function surface (reference SURVEY.md §2.10–2.11),
  * composed from codegen'd built-ins wherever possible; the custom Catalyst
  * expressions are [[graft.expressions.SequenceRatio]] and the fused vector
  * math in [[graft.expressions.VectorExpressions]].
  *
  * Hash-derived pseudo-random values are all md5-based so that any SQL engine
  * (the DuckDB oracle included) reproduces them bit-for-bit — no dependence
  * on Spark-private hash functions.
  */
object Functions {

  /** Register custom expressions for SQL use (`seq_ratio(a, b)`,
    * `vec_cosine(a, b)`, ...) on an existing session — the programmatic
    * twin of the config-driven `spark.sql.extensions=graft.GraftExtensions`
    * path; both install the SAME builder table
    * ([[GraftExtensions.functions]]), so the two surfaces cannot drift.
    */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** Unicode-normalize a string column to `form` (NFC/NFD/NFKC/NFKD) —
    * a codegen'd [[graft.expressions.UnicodeNormalize]].
    */
  def unicodeNormalize(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Dot product of two `array<double>` columns — fused codegen'd loop with
    * `aggregate(zip_with(a, b, *), 0.0, +)` fold semantics (bit-identical).
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity (0.0 when either norm is zero) — fused single-loop
    * twin of the `zip_with`/`aggregate` composite.
    */
  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared Euclidean distance of two `array<double>` columns. */
  def vecSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm: `sqrt(aggregate(a, 0.0, acc + x*x))`. */
  def vecNorm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  /** Unit-normalize; zero vectors (and empty arrays) pass through. */
  def vecNormalize(a: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(a)))

  /** Ratcliff–Obershelp similarity (difflib-compatible), as a Column. */
  def seqRatio(a: Column, b: Column): Column =
    ColumnBridge.column(
      SequenceRatio(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Capped longest-common-PREFIX length of two strings, in code points —
    * one codegen'd walk ([[graft.expressions.CommonPrefixLength]]) replacing
    * the interpreted `transform(sequence(1, m), ...)` + `array_position`
    * composite in the suffix-array LCP compares. `cap <= 0` yields 0.
    */
  def commonPrefixLen(a: Column, b: Column, cap: Column): Column =
    ColumnBridge.column(
      graft.expressions.CommonPrefixLength(
        ColumnBridge.expression(a), ColumnBridge.expression(b),
        ColumnBridge.expression(cap)))

  /** Longest-common-subsequence length of two token arrays
    * (`array<string>`) — the ROUGE-L backbone, codegen'd.
    */
  def lcsLen(a: Column, b: Column): Column =
    ColumnBridge.column(
      graft.expressions.LcsLength(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All non-overlapping match spans of `pattern` (a plan-time literal,
    * compiled once) as `array<struct<start, end>>` in UTF-16 units —
    * codegen'd [[graft.expressions.RegexSpans]].
    */
  def regexSpans(text: Column, pattern: String): Column =
    ColumnBridge.column(
      graft.expressions.RegexSpans(ColumnBridge.expression(text), pattern))

  /** Levenshtein-based similarity ratio in [0, 1]:
    * `1 - levenshtein(a,b) / max(len(a), len(b))`, 1.0 for two empty strings.
    * Oracle-portable alternative to [[seqRatio]] (DuckDB: `levenshtein`).
    */
  def levRatio(a: Column, b: Column): Column = {
    val denom = greatest(length(a), length(b))
    when(denom === 0, lit(1.0))
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") / denom.cast("double"))
  }

  /** Great-circle distance in feet (haversine; reference `util/gps_h.py:9-24`
    * uses the same formula with R = 3961 mi × 5280 ft).
    */
  def haversineFeet(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    val c = atan2(sqrt(a), sqrt(lit(1.0) - a)) * 2
    c * lit(3961.0 * 5280.0)
  }

  /** Slippy-map tile x-coordinate at `zoom` (OSM tile-name convention:
    * `xtile = ⌊(lon+180)/360 · 2^z⌋` — reference `docs/sharedstreets.md`
    * carries the same deg2num conversion in its investigation notes; the
    * formula itself is the public OpenStreetMap slippy-tilenames spec).
    * Pure per-row arithmetic on codegen'd built-ins.
    */
  def tileX(lon: Column, zoom: Int): Column = {
    require(zoom >= 0 && zoom <= 22, s"tile zoom $zoom out of range [0, 22]")
    floor((lon + lit(180.0)) / lit(360.0) * lit(math.pow(2.0, zoom))).cast("long")
  }

  /** Slippy-map tile y-coordinate at `zoom`:
    * `ytile = ⌊(1 − ln(tan φ + sec φ)/π)/2 · 2^z⌋` (the Mercator form of
    * the OSM spec — `ln(tan φ + sec φ)` ≡ `asinh(tan φ)`, written without
    * asinh so the SAME expression runs on engines that lack it).
    *
    * Latitudes past the Web-Mercator range (±85.05112878°) clamp to the
    * edge rows (0 north, 2^z−1 south) BEFORE the mercator expression: at
    * φ = −90° `tan φ + sec φ` evaluates to exactly 0.0 in doubles and
    * `log()` would return NULL, silently dropping the row from any
    * equi-join on the tile key. The result is additionally clamped into
    * [0, 2^z−1] so the south clamp boundary (where the mercator lands a
    * hair past −π) can never emit one-past-the-edge.
    */
  def tileY(lat: Column, zoom: Int): Column = {
    require(zoom >= 0 && zoom <= 22, s"tile zoom $zoom out of range [0, 22]")
    val n = 1L << zoom
    // least/greatest SKIP nulls (they would coerce a NULL latitude to the
    // edge row); the when-guard keeps NULL in → NULL out
    val phi = radians(least(greatest(lat, lit(-85.05112878)), lit(85.05112878)))
    val mercator = log(tan(phi) + lit(1.0) / cos(phi))
    when(lat.isNotNull,
      least(greatest(
        floor((lit(1.0) - mercator / lit(math.Pi)) / lit(2.0) * lit(math.pow(2.0, zoom)))
          .cast("long"),
        lit(0L)), lit(n - 1)))
  }

  /** SharedStreets-style intersection key: full-width md5 hex (32 chars) of
    * the message `"Intersection <lon> <lat>"` with coordinates fixed to 5
    * decimals — the deterministic geography-derived ID convention of the
    * SharedStreets referencing system (hash of a typed message over rounded
    * coordinates, lon-lat order; reference `docs/sharedstreets.md` notes
    * "MD5 hashing ... took the first 32 characters", which IS the full md5
    * hex width). Deterministic ⇒ usable as an equi-join key between
    * datasets that never shared surrogate IDs.
    */
  def intersectionId(lon: Column, lat: Column): Column =
    md5(format_string("Intersection %.5f %.5f", lon, lat))

  /** Normalize a 32-hex-char GUID to dashed 8-4-4-4-12 form (reference
    * `gs_ready.py:232-233` inserts dashes the same way).
    */
  def guidWithDashes(hex32: Column): Column =
    concat_ws(
      "-",
      substring(hex32, 1, 8),
      substring(hex32, 9, 4),
      substring(hex32, 13, 4),
      substring(hex32, 17, 4),
      substring(hex32, 21, 12))

  /** Day-of-week with Sunday = 0 (reference `wt_extract_soc.py:78`,
    * `gs_agg_extract_soc.py:124` compute `(weekday+1) %% 7`). Spark's
    * `dayofweek` is 1 = Sunday, so this is simply `dayofweek - 1`.
    */
  def dayOfWeekSun0(d: Column): Column = dayofweek(d) - 1

  /** `"HH:MM"` label of the containing 15-minute bin (reference
    * `wt_extract_soc.py:79`: `round(minute/15)*15` — actually *floor* since
    * the reference uses integer arithmetic on already-bucketed data; this
    * engine defines floor semantics).
    */
  def timeBin15(ts: Column): Column =
    concat(
      lpad(hour(ts).cast("string"), 2, "0"),
      lit(":"),
      lpad((floor(minute(ts) / 15) * 15).cast("string"), 2, "0"))

  /** Tumbling-window start: `ts` floored to `seconds`-wide epoch-aligned
    * buckets. Matches Spark's `window(ts, s)` start for epoch-aligned windows
    * and DuckDB's `to_timestamp(floor(epoch(ts)/s)*s)`.
    */
  def bucketStart(ts: Column, seconds: Int): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)

  /** Exact sum of a ≤2-decimal measure, surfaced as a rounded DOUBLE: the
    * DECIMAL sum is order-independent, so the result hashes identically
    * under any partitioning (used by every money/measure aggregate).
    */
  def sumExact2(c: Column): Column =
    roundHalfUp(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** Deterministic idempotent-publish key: md5 over "|"-joined natural-key
    * fields (reference `bt_extract_soc.py:110,130-135` hashes concatenated
    * natural keys so republishing upserts instead of duplicating).
    */
  def recordId(cols: Column*): Column = md5(concat_ws("|", cols: _*))

  /** First `bits` bits (≤ 60) of md5(s) as a non-negative long — the
    * engine's portable 'random' hash for MinHash / SimHash / LSH. Equivalent
    * DuckDB: `CAST('0x' || substr(md5(s), 1, bits/4) AS BIGINT)`.
    */
  def md5Bits(s: Column, bits: Int): Column = {
    require(bits % 4 == 0 && bits > 0 && bits <= 60, "bits must be a multiple of 4, <= 60")
    conv(substring(md5(s), 1, bits / 4), 16, 10).cast("long")
  }

  /** Engine-portable round-half-up: `floor(x·10ᵏ + 0.5) / 10ᵏ` evaluated in
    * DOUBLE. Spark's `round` rounds the *decimal string* of a double
    * (BigDecimal HALF_UP) while other engines round the binary value — the
    * two disagree exactly on `.…5` boundaries (e.g. `round(16.0675, 3)`).
    * This formula is the same IEEE operation sequence everywhere, so results
    * hash identically across engines and reruns.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    if (scale == 0) floor(c + 0.5).cast("double")
    else floor(c * p + 0.5) / p
  }

  /** Best-guess timestamp parse (reference `util/date_util.py:24-65`): try
    * the caller's format list in order, then ISO, then numeric UNIX epoch
    * (seconds); first success wins, null when nothing fits. All formats
    * parse with `try_to_timestamp` semantics so one malformed row nulls out
    * instead of failing the job (the reference logs-and-nulls the same way,
    * `bt_json_standard.py:90-104`).
    */
  def parseTimestampFlexible(c: Column, formats: Seq[String]): Column = {
    val tried = formats.map(f => try_to_timestamp(c, lit(f))) :+
      try_to_timestamp(c) :+
      when(c.rlike("^[0-9]{9,11}(\\.[0-9]+)?$"), timestamp_seconds(c.cast("double")))
    coalesce(tried: _*)
  }

  /** Truncate a timestamp to whole seconds. Synthetic inputs carry
    * nanosecond precision which Spark floors to microseconds while other
    * engines keep; queries that *return* timestamps truncate to seconds
    * before aggregation so results are engine-portable.
    */
  def toSecond(ts: Column): Column = date_trunc("second", ts)
}
