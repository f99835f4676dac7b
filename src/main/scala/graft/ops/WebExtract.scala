package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus extraction primitives: HTML → text, URL structure /
  * normalization / registered-domain, and jusText-style boilerplate line
  * removal.
  *
  * Everything here is a pure column-expression pipeline over built-in
  * functions (regexp chains + array higher-order functions) — zero
  * shuffles, whole-stage-codegen'd, and every step is replayable in ANSI
  * SQL, so the full extraction chain oracles (q_web_html / q_url_parse /
  * q_url_domain / q_bp_clean).
  *
  * Reference analog: the reference ingests already-clean CSV/JSON feeds
  * (atd_data_lake/aws_transport/csv_extract.py:1) — web extraction is a
  * training-data extension in the spirit of C4/RefinedWeb curation, which
  * this layer feeds into [[Curate.decideWeb]].
  *
  * Scale: per-row projections only. At 100 TB the cost is embarrassingly
  * parallel CPU over the scan, no exchange; the only aggregation in the
  * family is the bounded per-domain rollup (one map-side-partial groupBy
  * on registered domain — domains are a bounded set).
  */
object WebExtract {

  // ---------------------------------------------------------------- HTML

  /** Visible text of an HTML fragment:
    *
    *   1. comments, `<script>…</script>` and `<style>…</style>` bodies
    *      removed (non-greedy dotall — script text is NOT content);
    *   2. block-element boundaries (`<br>`, `<hr>`, closing
    *      p/div/li/tr/h1-6/ul/ol/table) become newlines so paragraph
    *      structure survives tag stripping;
    *   3. every remaining tag is stripped;
    *   4. the named entities `&lt; &gt; &quot; &#39; &apos; &nbsp;` are
    *      decoded, `&amp;` strictly LAST (so `&amp;lt;` decodes to the
    *      literal text `&lt;`, not `<` — the standard double-decode trap);
    *   5. horizontal whitespace collapses, lines are trimmed, empty lines
    *      drop, and the lines re-join on `\n`.
    *
    * The regexes are shared Java-regex/RE2 dialect (inline `(?is)` flags,
    * lazy quantifiers, no backrefs) so DuckDB replays them verbatim.
    */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val blocks = regexp_replace(
      noStyle,
      "(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|tr|h[1-6]|ul|ol|table)[^>]*>",
      "\n")
    val noTags = regexp_replace(blocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last — see scaladoc
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val lines = split(decoded, "\n")
    array_join(
      filter(
        transform(lines, l => trim(regexp_replace(l, "[ \\t]+", " "))),
        l => l =!= ""),
      "\n")
  }

  // ----------------------------------------------------------------- URL

  /** URL scheme, lower-cased; "" when the value has no `scheme://`. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Raw authority (userinfo@host:port) between `://` and the first
    * `/`, `?` or `#`.
    */
  private def urlAuthority(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** Host, lower-cased, userinfo and port stripped. */
  def urlHost(u: Column): Column =
    lower(regexp_replace(regexp_replace(urlAuthority(u), "^[^@]*@", ""),
      ":[0-9]*$", ""))

  /** Explicit port as INT; NULL when the URL carries none. */
  def urlPort(u: Column): Column =
    nullif(regexp_extract(urlAuthority(u), ":([0-9]+)$", 1), lit(""))
      .cast("int")

  /** Path (possibly ""): everything after the authority up to `?`/`#`. */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string without the `?` (pre-fragment only); "" when absent. */
  def urlQuery(u: Column): Column =
    regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)

  /** Fragment without the `#`; "" when absent. */
  def urlFragment(u: Column): Column =
    regexp_extract(u, "#(.*)$", 1)

  /** Tracking parameters dropped by [[normalizeUrl]]. */
  val TrackingParams: Seq[String] = Seq("utm_", "fbclid", "gclid")

  /** Canonical form for dedup/grouping:
    * lower-cased scheme+host; default ports (http:80, https:443) dropped,
    * other ports kept; empty path becomes "/"; query params with tracking
    * prefixes drop and the survivors SORT (byte order — param order never
    * splits a dedup group); fragment dropped. A value with no `scheme://`
    * cannot be parsed and passes through unchanged — fabricating
    * `"://…"` would merge every malformed row into one dedup group.
    */
  def normalizeUrl(u: Column): Column =
    when(urlScheme(u) === "", u).otherwise(normalizeParsedUrl(u))

  private def normalizeParsedUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val keepPort = port.isNotNull &&
      !(scheme === "http" && port === 80) &&
      !(scheme === "https" && port === 443)
    val path = when(urlPath(u) === "", "/").otherwise(urlPath(u))
    val params = filter(
      split(urlQuery(u), "&"),
      p => p =!= "" &&
        !TrackingParams.map(t => p.startsWith(t)).reduce(_ || _))
    val query = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port.cast("string"))).otherwise(""),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(""))
  }

  /** Country-code second-level suffixes under which the registrable unit
    * is three labels deep (a public-suffix-list stand-in: the full PSL is
    * a data file, the ALGORITHM is what matters here).
    */
  val CcSlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "com.au", "net.au", "co.in", "com.br", "co.nz")

  /** Registrable domain of a host: last two labels, or last three when
    * the last two form a cc-SLD ("a.b.co.uk" → "b.co.uk"). Hosts with
    * fewer labels than the rule wants return as-is.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && last2.isin(CcSlds: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  // --------------------------------------------------------- boilerplate

  /** Boilerplate line predicate (jusText-lite), over a RAW line that may
    * still carry inline markup. A line is boilerplate when any of:
    *
    *   - under `minWords` words (jusText's "too short to be content");
    *   - carries an `href=` (link-dominated nav at this grain — full link
    *     density needs a DOM, the 100 TB heuristic uses the marker);
    *   - copyright furniture: `©` / `(c)` / "all rights reserved";
    *   - pipe-separated nav: ≥ 2 `|` separators AND pipes ≥ words/3.
    *
    * Word = non-whitespace run of the line with tags stripped.
    */
  private def isBoilerplate(line: Column, minWords: Int): Column = {
    val plain = regexp_replace(line, "<[^>]+>", " ")
    val words = size(filter(split(trim(plain), "\\s+"), w => w =!= ""))
    val pipes = length(plain) - length(regexp_replace(plain, "\\|", ""))
    val lowered = lower(plain)
    (words < minWords) ||
      lowered.contains("href=") ||
      lowered.contains("©") || lowered.contains("(c)") ||
      lowered.contains("all rights reserved") ||
      (pipes >= 2 && pipes * 3 >= words)
  }

  /** Content text of a lined document: boilerplate lines removed (tags on
    * surviving lines stripped, whitespace canonicalized), survivors
    * re-joined on `\n` in original order. Pure array expression — no
    * explode, no shuffle, no per-line rows.
    */
  def removeBoilerplate(text: Column, minWords: Int = 4): Column = {
    val kept = filter(split(text, "\n"), l => !isBoilerplate(l, minWords))
    array_join(
      filter(
        transform(kept, l =>
          trim(regexp_replace(regexp_replace(l, "<[^>]+>", " "), "[ \\t]+", " "))),
        l => l =!= ""),
      "\n")
  }

  /** Per-document boilerplate metrics alongside the cleaned text:
    * `(n_lines, n_boiler, cleaned)`.
    */
  def boilerplateExprs(text: Column, minWords: Int = 4): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_boiler" -> size(filter(lines, l => isBoilerplate(l, minWords)))
        .cast("long"),
      "cleaned" -> removeBoilerplate(text, minWords))
  }
}
