package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.WebExtract

/** Web-extraction coverage: HTML → text, URL parse/normalize/registrable
  * domain + per-domain curation rollup, boilerplate line removal. The raw
  * corpus is plain prose, so each query synthesizes its web carrier
  * (markup, URLs, nav furniture) deterministically from the document row —
  * the same convention as q_tx_scrub / q_tx_repetition — and the DuckDB
  * oracle rebuilds carrier AND extraction from scratch.
  */
object QueriesWeb {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Deterministic HTML carrier for a document row. */
  private def htmlOf: Column = concat(
    lit("<!DOCTYPE html><html><head><title>"), col("source"), lit("</title>"),
    lit("<style type=\"text/css\">p { color: red; }</style>"),
    lit("<script>if (1 < 2) { var x = \"<p>\"; }</script></head><body>"),
    lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1>"),
    lit("<p>"), substring(col("text"), 1, 80),
    lit(" &amp; more &lt;tags&gt; &amp;lt;esc&amp;gt;</p>"),
    when(col("doc_id") % 3 === 0,
      concat(lit("<ul><li>"), substring(col("text"), 81, 40),
        lit("</li><li>b&nbsp;c</li></ul>"))).otherwise(lit("")),
    lit("<!-- hidden --><div>tail  "), substring(col("text"), 121, 40),
    lit("</div></body></html>"))

  /** Deterministic URL carrier: five shapes cycling on doc_id — mixed
    * case, default and explicit ports, userinfo, tracking params,
    * fragments, a cc-SLD domain, and a bare-host URL.
    */
  private def urlOf: Column = {
    val id = col("doc_id").cast("string")
    when(col("doc_id") % 5 === 0,
      concat(lit("HTTPS://WWW."), upper(col("source")), lit(".COM:443/articles/"),
        id, lit("?utm_source=x&b=2&a=1#frag")))
      .when(col("doc_id") % 5 === 1,
        concat(lit("http://shop."), col("source"),
          lit(".co.uk:8080/index.html?z=9&utm_campaign=c&y=1")))
      .when(col("doc_id") % 5 === 2,
        concat(lit("https://cdn."), col("source"), lit(".com/assets/img"),
          id, lit(".png")))
      .when(col("doc_id") % 5 === 3,
        concat(lit("http://user:pw@"), col("source"),
          lit(".com:80/download/?fbclid=abc&b=1")))
      .otherwise(concat(lit("https://"), col("source"), lit(".com")))
  }

  /** Lined carrier: nav bar, link row, short teaser and a copyright
    * footer interleaved with three prose slices.
    */
  private def linedOf: Column = concat_ws("\n",
    lit("Home | About | Contact | Pricing"),
    substring(col("text"), 1, 60),
    lit("<a href=\"/login\">Log in</a> or <a href=\"/signup\">sign up</a>"),
    substring(col("text"), 61, 60),
    lit("Read more"),
    substring(col("text"), 121, 60),
    concat(lit("© 2024 "), col("source"), lit(" Inc. All rights reserved.")))

  /** Domains a RefinedWeb-style curation pass refuses outright. */
  private val BlockedDomains = Seq("src3.com", "src7.co.uk", "src11.com")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HTML extraction — zero-shuffle per-row projection
    "q_web_html" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        WebExtract.htmlToText(htmlOf).as("extracted"))),

    // URL structure + canonical form + registrable domain
    "q_url_parse" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), urlOf.as("url"))
        .select(
          col("doc_id"),
          WebExtract.urlScheme(col("url")).as("scheme"),
          WebExtract.urlHost(col("url")).as("host"),
          WebExtract.urlPort(col("url")).as("port"),
          WebExtract.urlPath(col("url")).as("path"),
          WebExtract.urlQuery(col("url")).as("query"),
          WebExtract.urlFragment(col("url")).as("fragment"),
          WebExtract.registeredDomain(WebExtract.urlHost(col("url")))
            .as("domain"),
          WebExtract.normalizeUrl(col("url")).as("canon"))),

    // per-domain curation rollup: URL-level keep (blocklist + asset-path
    // ban) aggregated to the registrable domain — the bounded groupBy
    "q_url_domain" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), urlOf.as("url"))
        .select(
          col("n_chars"),
          WebExtract.registeredDomain(WebExtract.urlHost(col("url")))
            .as("domain"),
          (!WebExtract.registeredDomain(WebExtract.urlHost(col("url")))
            .isin(BlockedDomains: _*) &&
            !WebExtract.urlPath(col("url")).contains("/assets/"))
            .as("keep"))
        .groupBy(col("domain"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_chars")).as("tot_chars"))),

    // boilerplate line removal — zero-shuffle per-row array expressions
    "q_bp_clean" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id") +:
          WebExtract.boilerplateExprs(linedOf).map { case (n, c) => c.as(n) }: _*))
  )

  /** The HTML carrier, rebuilt in DuckDB SQL. (No line here may START
    * with `|` — these fragments interpolate into stripMargin'd outer
    * strings, which would eat the first pipe of a leading `||`.)
    */
  private val htmlSql =
    """'<!DOCTYPE html><html><head><title>' || source || '</title>' ||
      |  '<style type="text/css">p { color: red; }</style>' ||
      |  '<script>if (1 < 2) { var x = "<p>"; }</script></head><body>' ||
      |  '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
      |  '<p>' || substr(text, 1, 80) ||
      |  ' &amp; more &lt;tags&gt; &amp;lt;esc&amp;gt;</p>' ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN '<ul><li>' || substr(text, 81, 40) ||
      |         '</li><li>b&nbsp;c</li></ul>' ELSE '' END ||
      |  '<!-- hidden --><div>tail  ' || substr(text, 121, 40) ||
      |  '</div></body></html>'""".stripMargin

  /** The URL carrier, rebuilt in DuckDB SQL. */
  private val urlSql =
    """CASE doc_id % 5
      |  WHEN 0 THEN 'HTTPS://WWW.' || upper(source) || '.COM:443/articles/' ||
      |    CAST(doc_id AS VARCHAR) || '?utm_source=x&b=2&a=1#frag'
      |  WHEN 1 THEN 'http://shop.' || source ||
      |    '.co.uk:8080/index.html?z=9&utm_campaign=c&y=1'
      |  WHEN 2 THEN 'https://cdn.' || source || '.com/assets/img' ||
      |    CAST(doc_id AS VARCHAR) || '.png'
      |  WHEN 3 THEN 'http://user:pw@' || source ||
      |    '.com:80/download/?fbclid=abc&b=1'
      |  ELSE 'https://' || source || '.com' END""".stripMargin

  /** Shared URL-part extraction CTE body over a relation `u(doc_id, url,
    * ...)`: scheme/host/port/path/query/fragment exactly as
    * [[WebExtract]] computes them.
    */
  private val urlPartsSql =
    """SELECT *,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    lower(regexp_replace(regexp_replace(
      |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      |      '^[^@]*@', ''), ':[0-9]*$', '')) AS host,
      |    CAST(nullif(regexp_extract(
      |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      |      ':([0-9]+)$', 1), '') AS INT) AS port,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
      |    regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS query,
      |    regexp_extract(url, '#(.*)$', 1) AS fragment
      |  FROM u""".stripMargin

  /** Registrable domain of `host` in DuckDB SQL. */
  private val domainSql =
    """CASE
      |  WHEN len(string_split(host, '.')) >= 3 AND list_contains(
      |      ['co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp','com.au',
      |       'net.au','co.in','com.br','co.nz'],
      |      string_split(host, '.')[len(string_split(host, '.')) - 1] ||
      |        '.' || string_split(host, '.')[len(string_split(host, '.'))])
      |    THEN string_split(host, '.')[len(string_split(host, '.')) - 2] ||
      |      '.' || string_split(host, '.')[len(string_split(host, '.')) - 1] ||
      |      '.' || string_split(host, '.')[len(string_split(host, '.'))]
      |  WHEN len(string_split(host, '.')) >= 2
      |    THEN string_split(host, '.')[len(string_split(host, '.')) - 1] ||
      |      '.' || string_split(host, '.')[len(string_split(host, '.'))]
      |  ELSE host END""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_web_html" ->
      s"""WITH h AS (SELECT doc_id, $htmlSql AS x FROM documents),
         |s1 AS (SELECT doc_id,
         |  regexp_replace(x, '(?s)<!--.*?-->', ' ', 'g') AS x FROM h),
         |s2 AS (SELECT doc_id,
         |  regexp_replace(x, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM s1),
         |s3 AS (SELECT doc_id,
         |  regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(x,
         |  '(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|tr|h[1-6]|ul|ol|table)[^>]*>',
         |  chr(10), 'g') AS x FROM s3),
         |s5 AS (SELECT doc_id,
         |  regexp_replace(x, '<[^>]+>', ' ', 'g') AS x FROM s4),
         |s6 AS (SELECT doc_id,
         |  replace(replace(replace(replace(replace(replace(replace(x,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |    '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x FROM s5)
         |SELECT doc_id, array_to_string(
         |  list_filter(
         |    list_transform(string_split(x, chr(10)),
         |      l -> trim(regexp_replace(l, '[ \t]+', ' ', 'g'))),
         |    l -> l <> ''),
         |  chr(10)) AS extracted
         |FROM s6""".stripMargin,

    "q_url_parse" ->
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
         |p AS ($urlPartsSql),
         |d AS (SELECT *, $domainSql AS domain FROM p),
         |n AS (SELECT *,
         |  array_to_string(list_sort(list_filter(string_split(query, '&'),
         |    x -> x <> '' AND NOT starts_with(x, 'utm_')
         |      AND NOT starts_with(x, 'fbclid')
         |      AND NOT starts_with(x, 'gclid'))), '&') AS cq
         |  FROM d)
         |SELECT doc_id, scheme, host, port, path, query, fragment, domain,
         |  scheme || '://' || host
         |  || CASE WHEN port IS NOT NULL
         |       AND NOT (scheme = 'http' AND port = 80)
         |       AND NOT (scheme = 'https' AND port = 443)
         |     THEN ':' || CAST(port AS VARCHAR) ELSE '' END
         |  || CASE WHEN path = '' THEN '/' ELSE path END
         |  || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS canon
         |FROM n""".stripMargin,

    "q_url_domain" ->
      s"""WITH u AS (SELECT doc_id, n_chars, $urlSql AS url FROM documents),
         |p AS ($urlPartsSql),
         |d AS (SELECT *, $domainSql AS domain FROM p)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN NOT list_contains(
         |        ['src3.com','src7.co.uk','src11.com'], domain)
         |      AND NOT contains(path, '/assets/') THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS tot_chars
         |FROM d GROUP BY domain""".stripMargin,

    "q_bp_clean" ->
      """WITH lt AS (
        |  SELECT doc_id,
        |    'Home | About | Contact | Pricing' || chr(10)
        |    || substr(text, 1, 60) || chr(10)
        |    || '<a href="/login">Log in</a> or <a href="/signup">sign up</a>'
        |    || chr(10) || substr(text, 61, 60) || chr(10)
        |    || 'Read more' || chr(10) || substr(text, 121, 60) || chr(10)
        |    || chr(169) || ' 2024 ' || source || ' Inc. All rights reserved.'
        |      AS lt
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(lt, chr(10)) AS lines FROM lt),
        |fl AS (SELECT doc_id, lines,
        |  list_transform(lines, l -> (
        |    len(list_filter(regexp_split_to_array(
        |      trim(regexp_replace(l, '<[^>]+>', ' ', 'g')), '\s+'),
        |      x -> x <> '')) < 4)
        |    OR contains(lower(regexp_replace(l, '<[^>]+>', ' ', 'g')), 'href=')
        |    OR contains(l, chr(169))
        |    OR contains(lower(l), '(c)')
        |    OR contains(lower(l), 'all rights reserved')
        |    OR (length(regexp_replace(l, '<[^>]+>', ' ', 'g'))
        |        - length(replace(regexp_replace(l, '<[^>]+>', ' ', 'g'), '|', '')) >= 2
        |      AND (length(regexp_replace(l, '<[^>]+>', ' ', 'g'))
        |        - length(replace(regexp_replace(l, '<[^>]+>', ' ', 'g'), '|', ''))) * 3
        |        >= len(list_filter(regexp_split_to_array(
        |          trim(regexp_replace(l, '<[^>]+>', ' ', 'g')), '\s+'),
        |          x -> x <> '')))) AS bf
        |  FROM ls)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(bf, b -> b)) AS BIGINT) AS n_boiler,
        |  array_to_string(
        |    list_filter(
        |      list_transform(
        |        list_filter(lines, (l, i) -> NOT bf[i]),
        |        l -> trim(regexp_replace(regexp_replace(l, '<[^>]+>', ' ', 'g'),
        |          '[ \t]+', ' ', 'g'))),
        |      l -> l <> ''),
        |    chr(10)) AS cleaned
        |FROM fl""".stripMargin
  )
}
