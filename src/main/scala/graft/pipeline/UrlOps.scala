package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for the web-pipeline tier — C4/CCNet/RefinedWeb all key
  * their first dedup and their per-site caps on a NORMALIZED url and its
  * registered domain before any text op runs, so these are the front door
  * of a web-corpus pipeline. Everything here is pure `Column` expressions
  * (regexp/array builtins — codegen end-to-end, no UDF, no shuffle);
  * [[capPerDomain]] adds the one shuffle its semantics require, through
  * the map-side bounded-heap grouped top-k.
  *
  * Reference scope note: the reference engine (duckdb-ann) has no URL
  * tier; these follow the published web-pipeline recipes (Raffel et al.
  * 2020 §2.2 URL dedup; Penedo et al. 2023 RefinedWeb §3.1 URL filtering
  * + per-domain caps).
  */
object UrlOps {

  /** Query parameters dropped by [[normalizeUrl]] — click-tracking noise
    * that makes otherwise-identical URLs distinct (the dominant source of
    * false-unique URLs in web crawls). */
  private val TrackingParams =
    "utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src|s_kwcid"

  /** Canonical URL form (the C4/CCNet-style key for URL-level dedup):
    *
    *   - scheme and host lowercase; userinfo (`user:pass@`) dropped
    *   - default ports stripped (`:80` for http, `:443` for https; other
    *     ports kept)
    *   - fragment (`#…`) dropped
    *   - tracking query params dropped ([[TrackingParams]]); param order
    *     otherwise preserved; an emptied query loses its `?`
    *   - trailing slashes stripped from the path (root `/` becomes empty,
    *     so `https://h/` and `https://h` collide — the point)
    *
    * Inputs without a `scheme://` are not URLs → null. Null-safe. */
  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "") // fragment off first
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val hostPort = regexp_replace(authority, "^[^@]*@", "") // drop userinfo
    val host = lower(regexp_replace(hostPort, ":\\d+$", ""))
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val portOut = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathQuery, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    // param-NAME match is case-insensitive ((?i) covers only the name —
    // values keep their case) and valueless params count ("?utm_source"
    // and "?UTM_SOURCE=x" are the same click-tracking noise as
    // "?utm_source=x")
    val keptQuery = array_join(
      filter(split(query, "&"),
        p => !p.rlike(s"(?i)^($TrackingParams)(=|$$)") && p =!= ""),
      "&")
    val queryOut = when(keptQuery === "", lit(""))
      .otherwise(concat(lit("?"), keptQuery))
    when(url.isNull || scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portOut, path, queryOut))
  }

  /** Two-label public suffixes where the REGISTERED domain is three labels
    * (`example.co.uk`, not `co.uk`). A bounded approximation of the public
    * suffix list covering the common country registries — the full PSL is
    * a data file, not logic; swap this set for it when operating on real
    * crawls. */
  private val MultiPartSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "com.br", "net.br", "org.br",
    "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn",
    "co.nz", "com.mx", "com.tr", "co.za", "com.ar", "co.kr", "com.sg",
    "com.hk", "com.tw")

  /** Lowercased host of a URL (userinfo and port dropped); null when the
    * input has no `scheme://host`. */
  def urlHost(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1)
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")
    val hostPort = regexp_replace(regexp_extract(rest, "^([^/?]*)", 1), "^[^@]*@", "")
    val host = lower(regexp_replace(hostPort, ":\\d+$", ""))
    when(url.isNull || scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(host)
  }

  /** Registered domain (site key for per-domain caps and URL-level stats):
    * the last two host labels, or the last THREE when the two-label tail
    * is a known multi-part public suffix ([[MultiPartSuffixes]]). Hosts
    * with fewer than two labels (and IPv4 literals, which have no
    * registry) pass through unchanged. Null-safe. Pure array/string
    * Columns — row-local, codegen'd. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val isIpv4 = host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$")
    when(host.isNull, lit(null).cast("string"))
      .when(isIpv4 || n < 2, host)
      .when(last2.isin(MultiPartSuffixes: _*) && n >= 3, last3)
      .otherwise(last2)
  }

  /** Registered domain straight from a URL column. */
  def urlRegisteredDomain(url: Column): Column =
    registeredDomain(urlHost(url))

  /** RefinedWeb-style URL filtering signals (Penedo et al. 2023 §3.1):
    * appends three columns —
    *
    *   url_blocked       BOOLEAN — registered domain is in `blockedDomains`
    *                     (the curated blocklist path; pass a real list
    *                     like the public UT1 set at scale — broadcast as
    *                     a literal set, row-local membership test)
    *   url_word_score    DOUBLE — soft keyword score over the url string:
    *                     Σ weight(w) · occurrences(w in lowercased url),
    *                     the paper's weighted word match on strict-url
    *                     (subwords count, e.g. w in the domain or path)
    *   url_keep          BOOLEAN — !url_blocked AND score < `maxWordScore`
    *
    * Null/unparseable urls get url_blocked=false, score 0.0, url_keep
    * true — URL filtering only rejects evidence of a bad SITE; validity
    * is [[normalizeUrl]]'s job. Pure Column ops (member-of-literal-set +
    * per-keyword occurrence counts via length arithmetic), codegen, zero
    * shuffle. */
  def withUrlFilterSignals(df: DataFrame, urlCol: String,
                           blockedDomains: Set[String],
                           wordWeights: Map[String, Double],
                           maxWordScore: Double = 1.0): DataFrame = {
    require(wordWeights.keys.forall(_.nonEmpty), "empty keyword")
    // keywords match against the LOWERCASED url — lowercase them too, or
    // a mixed-case keyword could never score; merging collisions keeps
    // the caller's intent ("Casino" + "casino" weights add)
    val weights = wordWeights.groupMapReduce(_._1.toLowerCase)(_._2)(_ + _)
    val dom = urlRegisteredDomain(col(urlCol))
    val blocked =
      if (blockedDomains.isEmpty) lit(false)
      else coalesce(dom.isin(blockedDomains.map(_.toLowerCase).toSeq: _*),
        lit(false))
    val low = lower(col(urlCol))
    val score = weights.foldLeft(lit(0.0)) { case (acc, (w, wt)) =>
      // occurrences(w) = (len(url) - len(url with w removed)) / len(w)
      acc + (length(low) - length(call_function("replace", low, lit(w), lit(""))))
        .cast("double") / w.length * wt
    }
    df.withColumn("url_blocked", blocked)
      .withColumn("url_word_score", coalesce(score, lit(0.0)))
      .withColumn("url_keep",
        !col("url_blocked") && col("url_word_score") < maxWordScore)
  }

  /** URL-level exact dedup — C4's FIRST dedup step (before any text op):
    * keep exactly one row per NORMALIZED url ([[normalizeUrl]] is the
    * key, so `https://A.com/x?utm_source=t#f` and `https://a.com/x`
    * collide), the one with the smallest `orderCol` (an INTEGRAL column —
    * a doc id or an epoch-numeric crawl timestamp; keep-oldest). Rows
    * that do not normalize (no
    * `scheme://host`) are DROPPED, like [[capPerDomain]]. One
    * survivor-volume shuffle via the bounded-heap grouped top-k at k=1:
    * each partition emits at most one row per resident url before
    * anything moves — a viral url reduces map-side. */
  def dedupByUrl(df: DataFrame, urlCol: String, orderCol: String): DataFrame = {
    val withNorm = df.withColumn("__unorm", normalizeUrl(col(urlCol)))
      .filter(col("__unorm").isNotNull)
      .withColumn("__ord", col(orderCol).cast("double"))
    graft.operators.TopK.grouped(withNorm, "__unorm", "__ord", orderCol, 1)
      .drop("__unorm", "__ord")
  }

  /** Per-domain cap sampling (RefinedWeb-style site balancing): keep at
    * most `cap` rows per registered domain of `urlCol`, the ones with the
    * SMALLEST `orderCol` (deterministic — an INTEGRAL doc id,
    * epoch-numeric crawl timestamp, or quality rank; TIMESTAMP columns
    * should be converted with unix_micros first). Rows whose URL yields
    * no registered domain are
    * DROPPED (they are not web documents and would otherwise pool into
    * one pseudo-domain; run URL validation upstream if they must be
    * kept). One shuffle at survivor volume: the map-side bounded-heap
    * grouped top-k reduces every partition to ≤ cap rows per resident
    * domain before anything moves. `orderCol` must be an integral column
    * (it is the tie-break of its own ordering, so the cut is total and
    * unique). */
  def capPerDomain(df: DataFrame, urlCol: String, cap: Int,
                   orderCol: String): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val withDom = df.withColumn("__dom", urlRegisteredDomain(col(urlCol)))
      .filter(col("__dom").isNotNull)
      .withColumn("__ord", col(orderCol).cast("double"))
    graft.operators.TopK.grouped(withDom, "__dom", "__ord", orderCol, cap)
      .drop("__dom", "__ord")
  }
}
