package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL parsing kernels behind [[graft.pipeline.UrlOps]] —
  * the semantics of the original regexp-Column stack (UrlOpsSpec and the
  * `url_*` strict driver rows are the oracle), one character scan instead
  * of ~12 regex passes. ONE deliberate divergence: inputs containing line
  * terminators. Java regex `$`/`.` stop at `\n`, so the old stack's
  * fragment/query/tracking rules silently ignored anything after an
  * embedded newline (an accident of anchor semantics, not a spec); the
  * kernel treats control characters like any other byte — the fragment
  * cuts at the FIRST `#` wherever it sits, and a host carrying `\n` is
  * just a (garbage) host. Deterministic garbage-in/garbage-out beats
  * anchor artifacts for crawl dedup keys; the fuzz spec generates control
  * characters and pins no-throw + idempotence over them. Exposed to
  * Catalyst via
  * `StaticInvoke` (codegen'd straight-line call, interpreted-safe,
  * null-propagating) — on the C4 front-door shapes (`dedupByUrl` at crawl
  * volume) the regex stack was the dominant per-row cost AND pushed the
  * generated CASE tree past the whole-stage compiler's limits.
  *
  * Semantics contract (kept exactly, including the quirks):
  *   - leading/trailing SPACES trimmed (Spark `trim` — spaces only)
  *   - fragment cut at the first `#` before anything else
  *   - scheme `[A-Za-z][A-Za-z0-9+.\-]*://` required, else null; lowercased
  *   - authority = up to the first `/` or `?`; userinfo up to the LAST
  *     `@` inside it dropped (a host cannot contain `@` — first-`@`
  *     stripping broke idempotence on double-`@` inputs)
  *   - port = trailing `:digits` of the host-port (string-compared:
  *     `:080` is NOT a default port); default ports dropped per scheme
  *   - empty host → null (scheme-only inputs are not URLs)
  *   - path = up to the first `?`, ALL trailing slashes stripped
  *   - query = after the first `?`; `&`-segments that are empty or whose
  *     NAME (up to `=`, or the whole segment) case-insensitively matches
  *     a tracking param (`utm_[A-Za-z0-9_]*`, fbclid, gclid, msclkid,
  *     mc_eid, igshid, ref_src, s_kwcid) drop; order otherwise kept; an
  *     emptied query loses its `?`
  */
object UrlKernels {

  /** Canonical URL form; null for null input / non-URLs. UTF8String in and
    * out — the StaticInvoke fast path (no row-level codec). */
  def normalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = normalizeJava(u.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Lowercased host (userinfo and port dropped); null for non-URLs. */
  def host(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = hostJava(u.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Registered domain under the bounded DEFAULT multi-part-suffix set
    * (the pure-codegen sibling of `UrlOps.SuffixRules` — last two host
    * labels, or three when the two-label tail is a known multi-part
    * suffix; IPv4 literals, single-label and bare-suffix hosts pass
    * through). Exactly the original split/isin/rlike Column semantics,
    * one scan. */
  def registeredDomainDefault(h: UTF8String): UTF8String = {
    if (h == null) return null
    val host = h.toString
    val out = registeredDomainDefaultJava(host)
    if (out eq host) h else UTF8String.fromString(out)
  }

  /** The default two-label public suffixes (registered domain = three
    * labels) — the bounded approximation the Column path always used;
    * the full PSL goes through `UrlOps.SuffixRules`. */
  private[graft] val DefaultMultiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "com.br", "net.br", "org.br",
    "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn",
    "co.nz", "com.mx", "com.tr", "co.za", "com.ar", "co.kr", "com.sg",
    "com.hk", "com.tw")

  private val DefaultSuffixSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](64)
    DefaultMultiPartSuffixes.foreach(s.add)
    s
  }

  private[graft] def registeredDomainDefaultJava(host: String): String = {
    if (isIpv4(host)) return host
    val d1 = host.lastIndexOf('.')
    if (d1 < 0) return host // single label
    val d2 = host.lastIndexOf('.', d1 - 1)
    val last2 = host.substring(d2 + 1)
    // three labels needed for the multi-part cut (a bare suffix has no
    // registrant and passes through)
    if (d2 >= 0 && DefaultSuffixSet.contains(last2)) {
      val d3 = host.lastIndexOf('.', d2 - 1)
      host.substring(d3 + 1)
    } else last2
  }

  /** Exactly `^\d{1,3}(\.\d{1,3}){3}$`. */
  private def isIpv4(s: String): Boolean = {
    val n = s.length
    var i = 0
    var groups = 0
    while (groups < 4) {
      var d = 0
      while (i < n && d < 3 && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        i += 1; d += 1
      }
      if (d == 0) return false
      groups += 1
      if (groups < 4) {
        if (i >= n || s.charAt(i) != '.') return false
        i += 1
      }
    }
    i == n
  }

  /** Parse result: scheme and host lowercased, port as written ("" when
    * absent), pathQuery as written. */
  private final class Parsed(val scheme: String, val host: String,
                             val port: String, val pathQuery: String)

  private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  private def parse(url: String): Parsed = {
    // trim SPACES only (Spark trim semantics), then cut the fragment
    var a = 0
    var b = url.length
    while (a < b && url.charAt(a) == ' ') a += 1
    while (b > a && url.charAt(b - 1) == ' ') b -= 1
    val hash = url.indexOf('#', a)
    if (hash >= 0 && hash < b) b = hash
    // scheme://  (greedy scheme-char scan needs no backtracking: ':' and
    // '/' are not scheme chars)
    if (a >= b || !isAlpha(url.charAt(a))) return null
    var i = a + 1
    while (i < b && isSchemeChar(url.charAt(i))) i += 1
    if (i + 2 >= b || url.charAt(i) != ':' || url.charAt(i + 1) != '/' ||
        url.charAt(i + 2) != '/') return null
    val scheme = toLower(url.substring(a, i))
    // authority = up to the first '/' or '?'
    val j = i + 3
    var k = j
    while (k < b && url.charAt(k) != '/' && url.charAt(k) != '?') k += 1
    // userinfo: drop through the LAST '@' inside the authority (an RFC
    // 3986 host cannot contain '@'; the old first-'@' regex left
    // "pass@h" as the host of "https://user@pass@h/", breaking
    // normalize-idempotence — the fuzz spec pins the fix)
    var hs = j
    var m = j
    while (m < k) {
      if (url.charAt(m) == '@') hs = m + 1
      m += 1
    }
    // trailing ":digits" = port (at least one digit, nothing after)
    var he = k
    var port = ""
    var d = k - 1
    while (d >= hs && url.charAt(d) >= '0' && url.charAt(d) <= '9') d -= 1
    if (d < k - 1 && d >= hs && url.charAt(d) == ':') {
      port = url.substring(d + 1, k)
      he = d
    }
    if (hs >= he) return null // empty host
    val host = toLower(url.substring(hs, he))
    new Parsed(scheme, host, port, url.substring(k, b))
  }

  /** Lowercase matching Spark's `lower()`: ASCII fast path, JDK fallback
    * for the non-ASCII remainder (what UTF8String.toLowerCase does). */
  private def toLower(s: String): String = {
    var i = 0
    var ascii = true
    var needs = false
    while (i < s.length && ascii) {
      val c = s.charAt(i)
      if (c >= 0x80) ascii = false
      else if (c >= 'A' && c <= 'Z') needs = true
      i += 1
    }
    if (!ascii) s.toLowerCase
    else if (!needs) s
    else {
      val out = new Array[Char](s.length)
      var p = 0
      while (p < s.length) {
        val c = s.charAt(p)
        out(p) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        p += 1
      }
      new String(out)
    }
  }

  private[graft] def hostJava(url: String): String = {
    val p = parse(url)
    if (p == null) null else p.host
  }

  private[graft] def normalizeJava(url: String): String = {
    val p = parse(url)
    if (p == null) return null
    val portOut =
      if (p.port.isEmpty) ""
      else if (p.scheme == "http" && p.port == "80") ""
      else if (p.scheme == "https" && p.port == "443") ""
      else ":" + p.port
    val pq = p.pathQuery
    val qi = pq.indexOf('?')
    var pathEnd = if (qi >= 0) qi else pq.length
    while (pathEnd > 0 && pq.charAt(pathEnd - 1) == '/') pathEnd -= 1
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(p.scheme).append("://").append(p.host).append(portOut)
    sb.append(pq, 0, pathEnd)
    if (qi >= 0) {
      val qb = new java.lang.StringBuilder(pq.length - qi)
      var s0 = qi + 1
      val n = pq.length
      while (s0 <= n) {
        var e = pq.indexOf('&', s0)
        if (e < 0) e = n
        if (e > s0 && !isTrackingParam(pq, s0, e)) {
          if (qb.length > 0) qb.append('&')
          qb.append(pq, s0, e)
        }
        s0 = e + 1
      }
      if (qb.length > 0) sb.append('?').append(qb)
    }
    sb.toString
  }

  private val TrackingNames = Array(
    "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref_src", "s_kwcid")

  /** Does segment [s, e) of `q` name a tracking param? The NAME is the
    * part before '=' (or the whole segment when valueless); matching is
    * ASCII-case-insensitive like the original `(?i)` regex. */
  private def isTrackingParam(q: String, s: Int, e: Int): Boolean = {
    var ne = s
    while (ne < e && q.charAt(ne) != '=') ne += 1
    val len = ne - s
    if (len >= 4 && regionEqIgnoreCase(q, s, "utm_")) {
      var i = s + 4
      while (i < ne) {
        val c = q.charAt(i)
        if (!(isAlpha(c) || (c >= '0' && c <= '9') || c == '_')) return false
        i += 1
      }
      return true
    }
    var t = 0
    while (t < TrackingNames.length) {
      val nm = TrackingNames(t)
      if (nm.length == len && regionEqIgnoreCase(q, s, nm)) return true
      t += 1
    }
    false
  }

  private def regionEqIgnoreCase(q: String, s: Int, nm: String): Boolean = {
    var i = 0
    while (i < nm.length) {
      val a = q.charAt(s + i)
      val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      if (al != nm.charAt(i)) return false
      i += 1
    }
    true
  }
}
