package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.UrlOps
import QuerySupport._

/** Driver surface for the URL web-pipeline tier. The documents table has
  * no URL column, so each query synthesizes a deterministic MESSY url from
  * doc_id (uppercase scheme/host, default and non-default ports, userinfo,
  * tracking params, fragments, trailing slashes, multi-part-suffix hosts,
  * and outright non-URLs) and runs the real operators over it; the DuckDB
  * oracle predicts the normalized form / registered domain / cap survivors
  * arithmetically from the same doc_id derivation, so the whole operator
  * chain is hash-verified strictly. */
object UrlQueries {

  /** The messy-url fixture: variant = doc_id % 6, site key = doc_id % 20. */
  private def messyUrl(idCol: String): org.apache.spark.sql.Column = {
    val k = (col(idCol) % 20).cast("string")
    val v = col(idCol) % 6
    when(v === 0, concat(lit("https://Site"), k,
        lit(".Example.com:443/path/Page?utm_source=x&ref=1#frag")))
      .when(v === 1, concat(lit("HTTP://site"), k, lit(".example.com:80/")))
      .when(v === 2, concat(lit("https://www.site"), k,
        lit(".co.uk/a/b/?fbclid=abc")))
      .when(v === 3, concat(lit("https://user:pw@site"), k,
        lit(".example.com:8080/a?b=2&utm_medium=m&c=3")))
      .when(v === 4, concat(lit("https://site"), k, lit(".example.com#x")))
      .otherwise(concat(lit("not a url "), k))
  }

  private def withUrl(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), messyUrl("doc_id").as("url"))

  /** The same fixture in DuckDB SQL (shared by all three oracles). */
  private val MessyUrlSql =
    """CASE doc_id % 6
      |  WHEN 0 THEN 'https://Site' || CAST(doc_id % 20 AS VARCHAR) || '.Example.com:443/path/Page?utm_source=x&ref=1#frag'
      |  WHEN 1 THEN 'HTTP://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com:80/'
      |  WHEN 2 THEN 'https://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk/a/b/?fbclid=abc'
      |  WHEN 3 THEN 'https://user:pw@site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com:8080/a?b=2&utm_medium=m&c=3'
      |  WHEN 4 THEN 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com#x'
      |  ELSE 'not a url ' || CAST(doc_id % 20 AS VARCHAR)
      |END""".stripMargin

  /** Expected normalized form, predicted arithmetically. */
  private val NormalizedSql =
    """CASE doc_id % 6
      |  WHEN 0 THEN 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/path/Page?ref=1'
      |  WHEN 1 THEN 'http://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
      |  WHEN 2 THEN 'https://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk/a/b'
      |  WHEN 3 THEN 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com:8080/a?b=2&c=3'
      |  WHEN 4 THEN 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
      |  ELSE NULL
      |END""".stripMargin

  /** Expected registered domain (multi-part suffix case at variant 2). */
  private val DomainSql =
    """CASE doc_id % 6
      |  WHEN 2 THEN 'site' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk'
      |  WHEN 5 THEN NULL
      |  ELSE 'example.com'
      |END""".stripMargin

  /** PSL-only host fixture: hosts whose registered domain the bounded
    * constant suffix set CANNOT get right — a com.pl registry domain, a
    * `*.ck` wildcard, the `!www.ck` exception, a private registry
    * (blogspot.com), a higher-order wildcard (`*.kawasaki.jp`), and a
    * default-rule TLD. variant = doc_id % 6, site key = doc_id % 20. */
  private def pslHost(idCol: String): org.apache.spark.sql.Column = {
    val k = (col(idCol) % 20).cast("string")
    val v = col(idCol) % 6
    when(v === 0, concat(lit("www.site"), k, lit(".com.pl")))
      .when(v === 1, concat(lit("a.b.site"), k, lit(".foo.ck")))
      .when(v === 2, concat(lit("sub"), k, lit(".www.ck")))
      .when(v === 3, concat(lit("blog"), k, lit(".blogspot.com")))
      .when(v === 4, concat(lit("deep.sub.site"), k, lit(".kawasaki.jp")))
      .otherwise(concat(lit("x.y.site"), k, lit(".example")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // canonical URL form: lowercase scheme/host, default ports off,
    // userinfo/fragment/tracking params off, trailing slash off. Strict —
    // the oracle predicts every variant's normal form.
    "url_normalize" -> ((s: SparkSession, dir: String) =>
      withUrl(s, dir)
        .select(col("doc_id"), col("url"),
          UrlOps.normalizeUrl(col("url")).as("url_norm"))
        .orderBy("doc_id")),

    // host → registered domain, including the multi-part public-suffix
    // path (site{k}.co.uk, not co.uk) and null for non-URLs. Strict.
    "url_domain" -> ((s: SparkSession, dir: String) =>
      withUrl(s, dir)
        .select(col("doc_id"),
          UrlOps.urlHost(col("url")).as("host"),
          UrlOps.urlRegisteredDomain(col("url")).as("domain"))
        .orderBy("doc_id")),

    // RefinedWeb URL filtering: curated domain blocklist + weighted
    // keyword score over the url string. Keywords hit variant 0 ("page"
    // in the path, weight 1.2 → score-rejected) and variant 3 ("8080",
    // 0.5 → kept); the blocklist hits two .co.uk domains. Strict: every
    // signal is arithmetic in the variant. Score rounded on both sides.
    "url_filter" -> ((s: SparkSession, dir: String) =>
      UrlOps.withUrlFilterSignals(withUrl(s, dir), "url",
          blockedDomains = Set("site2.co.uk", "site8.co.uk"),
          wordWeights = Map("page" -> 1.2, "8080" -> 0.5),
          maxWordScore = 1.0)
        .select(col("doc_id"), col("url_blocked"),
          round(col("url_word_score"), 4).as("url_word_score"),
          col("url_keep"))
        .orderBy("doc_id")),

    // C4's first dedup step: one survivor per NORMALIZED url, keep-oldest
    // (min doc_id). The fixture repeats each messy url every 60 ids
    // (lcm of the variant and site-key moduli), so the survivor set is
    // exactly the min id of each residue class — arithmetic for the
    // oracle. Strict.
    "url_dedup" -> ((s: SparkSession, dir: String) =>
      UrlOps.dedupByUrl(withUrl(s, dir), "url", orderCol = "doc_id")
        .select(col("doc_id"),
          UrlOps.normalizeUrl(col("url")).as("url_norm"))
        .orderBy("doc_id")),

    // RefinedWeb-style per-site cap: keep the 3 lowest doc_ids per
    // registered domain (unparseable URLs drop). The bounded-heap grouped
    // top-k makes the plan one survivor-volume shuffle. Runs the PARSED
    // SuffixRules path (the bundled PSL sample — a superset of the
    // constant set, so the fixture's domains are unchanged and the same
    // arithmetic oracle verifies the full-PSL matcher). Strict: the
    // oracle's row_number window replays the cut exactly.
    "url_domain_cap" -> ((s: SparkSession, dir: String) =>
      UrlOps.capPerDomain(withUrl(s, dir), "url", cap = 3,
          orderCol = "doc_id", rules = UrlOps.SuffixRules.bundledSample)
        .select(col("doc_id"),
          UrlOps.urlRegisteredDomain(col("url")).as("domain"))
        .orderBy("domain", "doc_id")),

    // Full-PSL registered-domain semantics on hosts the constant set
    // cannot key: com.pl registry, *.ck wildcard, !www.ck exception,
    // blogspot.com private registry, *.kawasaki.jp, default TLD rule.
    // Strict — the oracle predicts each variant arithmetically.
    "url_domain_psl" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "documents")
        .select(col("doc_id"), pslHost("doc_id").as("host"))
        .select(col("doc_id"), col("host"),
          UrlOps.registeredDomain(col("host"),
            UrlOps.SuffixRules.bundledSample).as("domain"))
        .orderBy("doc_id")),

    // The blocklist-as-DataFrame filter path (the UT1-scale shape): same
    // fixture and signals as url_filter, with the two blocked domains
    // arriving as a DataFrame (plus case/whitespace noise and a domain
    // that matches nothing) through the broadcast left join. Same oracle
    // as url_filter — the two overloads must agree exactly.
    "url_filter_bl" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bl = Seq("  Site2.CO.UK ", "site8.co.uk", "malware.example",
        "site2.co.uk").toDF("dom")
      UrlOps.withUrlFilterSignals(withUrl(s, dir), "url",
          blocklist = bl, blocklistCol = "dom",
          wordWeights = Map("page" -> 1.2, "8080" -> 0.5),
          maxWordScore = 1.0)
        .select(col("doc_id"), col("url_blocked"),
          round(col("url_word_score"), 4).as("url_word_score"),
          col("url_keep"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "url_normalize" ->
      s"""SELECT doc_id, $MessyUrlSql AS url, $NormalizedSql AS url_norm
         |FROM documents ORDER BY doc_id""".stripMargin,

    "url_domain" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 6
         |    WHEN 0 THEN 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
         |    WHEN 2 THEN 'www.site' || CAST(doc_id % 20 AS VARCHAR) || '.co.uk'
         |    WHEN 5 THEN NULL
         |    ELSE 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
         |  END AS host,
         |  $DomainSql AS domain
         |FROM documents ORDER BY doc_id""".stripMargin,

    "url_filter" ->
      """SELECT doc_id,
        |  (doc_id % 6 = 2 AND doc_id % 20 IN (2, 8)) AS url_blocked,
        |  ROUND(CAST(CASE doc_id % 6 WHEN 0 THEN 1.2 WHEN 3 THEN 0.5 ELSE 0.0 END AS DOUBLE), 4) AS url_word_score,
        |  (NOT (doc_id % 6 = 2 AND doc_id % 20 IN (2, 8))
        |   AND CASE doc_id % 6 WHEN 0 THEN 1.2 WHEN 3 THEN 0.5 ELSE 0.0 END < 1.0) AS url_keep
        |FROM documents ORDER BY doc_id""".stripMargin,

    "url_dedup" ->
      s"""SELECT doc_id, $NormalizedSql AS url_norm FROM (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY doc_id % 60 ORDER BY doc_id) AS rn
         |  FROM documents WHERE doc_id % 6 <> 5)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "url_domain_cap" ->
      s"""SELECT doc_id, domain FROM (
         |  SELECT doc_id, $DomainSql AS domain,
         |    row_number() OVER (PARTITION BY $DomainSql ORDER BY doc_id) AS rn
         |  FROM documents WHERE doc_id % 6 <> 5)
         |WHERE rn <= 3 ORDER BY domain, doc_id""".stripMargin,

    "url_domain_psl" ->
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'www.site' || CAST(doc_id % 20 AS VARCHAR) || '.com.pl'
        |    WHEN 1 THEN 'a.b.site' || CAST(doc_id % 20 AS VARCHAR) || '.foo.ck'
        |    WHEN 2 THEN 'sub' || CAST(doc_id % 20 AS VARCHAR) || '.www.ck'
        |    WHEN 3 THEN 'blog' || CAST(doc_id % 20 AS VARCHAR) || '.blogspot.com'
        |    WHEN 4 THEN 'deep.sub.site' || CAST(doc_id % 20 AS VARCHAR) || '.kawasaki.jp'
        |    ELSE 'x.y.site' || CAST(doc_id % 20 AS VARCHAR) || '.example'
        |  END AS host,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'site' || CAST(doc_id % 20 AS VARCHAR) || '.com.pl'
        |    WHEN 1 THEN 'site' || CAST(doc_id % 20 AS VARCHAR) || '.foo.ck'
        |    WHEN 2 THEN 'www.ck'
        |    WHEN 3 THEN 'blog' || CAST(doc_id % 20 AS VARCHAR) || '.blogspot.com'
        |    WHEN 4 THEN 'sub.site' || CAST(doc_id % 20 AS VARCHAR) || '.kawasaki.jp'
        |    ELSE 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example'
        |  END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,

    "url_filter_bl" ->
      """SELECT doc_id,
        |  (doc_id % 6 = 2 AND doc_id % 20 IN (2, 8)) AS url_blocked,
        |  ROUND(CAST(CASE doc_id % 6 WHEN 0 THEN 1.2 WHEN 3 THEN 0.5 ELSE 0.0 END AS DOUBLE), 4) AS url_word_score,
        |  (NOT (doc_id % 6 = 2 AND doc_id % 20 IN (2, 8))
        |   AND CASE doc_id % 6 WHEN 0 THEN 1.2 WHEN 3 THEN 0.5 ELSE 0.0 END < 1.0) AS url_keep
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
