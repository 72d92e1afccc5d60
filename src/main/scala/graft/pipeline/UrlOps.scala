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

  /** Canonical URL form (the C4/CCNet-style key for URL-level dedup):
    *
    *   - scheme and host lowercase; userinfo (`user:pass@`) dropped
    *   - default ports stripped (`:80` for http, `:443` for https; other
    *     ports kept)
    *   - fragment (`#…`) dropped
    *   - tracking query params dropped (`utm_[A-Za-z0-9_]*`, fbclid,
    *     gclid, msclkid, mc_eid, igshid, ref_src, s_kwcid — click-tracking
    *     noise, the dominant source of false-unique URLs in crawls;
    *     param-NAME match case-insensitive, valueless params count);
    *     param order otherwise preserved; an emptied query loses its `?`
    *   - trailing slashes stripped from the path (root `/` becomes empty,
    *     so `https://h/` and `https://h` collide — the point)
    *
    * Inputs without a `scheme://` are not URLs → null. Null-safe.
    *
    * Implementation: a single-pass parse kernel
    * ([[graft.functions.UrlKernels.normalize]]) behind a `StaticInvoke` —
    * codegen'd, null-propagating, row-local. The original ~12-regexp
    * Column stack had the same semantics (the kernel is spec- and
    * oracle-pinned against it) but was the dominant per-row cost at crawl
    * volume and inflated the generated CASE tree past the whole-stage
    * compiler's limits. */
  def normalizeUrl(url: Column): Column = staticInvoke("normalize", url)

  private def staticInvoke(fn: String, url: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        graft.functions.UrlKernels.getClass,
        org.apache.spark.sql.types.StringType, fn,
        Seq(org.apache.spark.sql.GraftBridge.expression(url)),
        inputTypes = Seq(org.apache.spark.sql.types.StringType)))

  /** Public-suffix rule set with the publicsuffix.org matching semantics:
    * `plain` entries are suffixes as written, `wildcard` holds the parent
    * of `*.` rules (`*.ck` → `"ck"`: every single label under it is a
    * suffix), `exception` holds `!` rules without the bang (`!www.ck`:
    * NOT a suffix even though `*.ck` matches — its suffix is the rule
    * minus its leftmost label). The implicit default rule `*` (every bare
    * TLD is a suffix) is always in effect. Longest match wins; a matching
    * exception prevails over everything.
    *
    * Build one from the real PSL file with [[SuffixRules.parse]] (the
    * bundled `graft/public_suffix_sample.dat` resource is a working
    * subset for tests and smoke runs — swap in the full
    * publicsuffix.org/list file for production crawls). The set rides the
    * task closure (~hundreds of KB at full-PSL size), so lookup is
    * row-local and shuffle-free at any corpus scale. */
  final case class SuffixRules(plain: Set[String], wildcard: Set[String],
                               exception: Set[String]) {
    require((plain ++ wildcard ++ exception).forall(s =>
      s.nonEmpty && s == s.toLowerCase && !s.contains('*') && !s.contains('!')),
      "suffix entries must be lowercase bare domains (parse() normalizes)")

    /** Deepest label count any rule can match — bounds the probe loop. */
    private val maxProbe: Int = {
      def labels(s: String) = s.count(_ == '.') + 1
      val p = plain.iterator.map(labels) ++
        wildcard.iterator.map(labels(_) + 1) ++ exception.iterator.map(labels)
      (p ++ Iterator(1)).max
    }

    /** Registered domain of a (lowercased) host under these rules: the
      * public suffix plus one label. Hosts that ARE a public suffix, IPv4
      * literals, and single-label hosts pass through unchanged (no
      * registrant to name); null → null. The PSL algorithm, iterative:
      * probe the last i labels for i = 1..maxProbe, keep the longest
      * match, let an exception prevail immediately. */
    private[pipeline] def registeredDomainOf(host: String): String = {
      if (host == null) return null
      if (Ipv4Pattern.matcher(host).matches()) return host
      // limit -1 keeps trailing empty labels: a trailing-dot FQDN
      // ("bbc.co.uk.") must key identically to the default kernel path,
      // which sees the empty last label (Scala's split(Char) would
      // silently drop it and name a different registered domain)
      val labels = host.split("\\.", -1)
      val n = labels.length
      if (n < 2) return host
      var suffix = 1 // the implicit default rule: the TLD is a suffix
      var i = 1
      val probe = math.min(n, maxProbe)
      var done = false
      while (i <= probe && !done) {
        val tail = labels.slice(n - i, n).mkString(".")
        if (exception.contains(tail)) { suffix = i - 1; done = true }
        else {
          if (plain.contains(tail)) suffix = i
          if (i >= 2 && wildcard.contains(labels.slice(n - i + 1, n).mkString(".")))
            suffix = math.max(suffix, i)
          i += 1
        }
      }
      if (suffix >= n) host
      else labels.slice(n - suffix - 1, n).mkString(".")
    }
  }

  private val Ipv4Pattern =
    java.util.regex.Pattern.compile("^\\d{1,3}(\\.\\d{1,3}){3}$")

  object SuffixRules {
    /** Parse PSL file lines (publicsuffix.org/list format): `//` comments
      * and blanks skipped, a rule ends at the first whitespace, `!` marks
      * exceptions, `*.` marks wildcards, everything lowercased. */
    def parse(lines: IterableOnce[String]): SuffixRules = {
      val plain = Set.newBuilder[String]
      val wild = Set.newBuilder[String]
      val exc = Set.newBuilder[String]
      lines.iterator.foreach { raw =>
        val line = raw.trim.takeWhile(!_.isWhitespace).toLowerCase
        if (line.nonEmpty && !line.startsWith("//") && line != "*") {
          if (line.startsWith("!")) exc += line.drop(1)
          else if (line.startsWith("*.")) wild += line.drop(2)
          else plain += line
        }
      }
      SuffixRules(plain.result(), wild.result(), exc.result())
    }

    /** Parse a PSL file from disk, cached by (absolute path, mtime) — the
      * SQL TVF surface resolves a path argument per query, and the full
      * PSL is ~15k lines (parse once, reuse the immutable rule set).
      * Keying on the mtime means a long-running service that refreshes
      * the downloaded list in place (the publicsuffix.org weekly cadence)
      * picks the new rules up on the next query instead of keying whole
      * registries on a stale set for the JVM lifetime. */
    def parseFile(path: String): SuffixRules = {
      val p = java.nio.file.Paths.get(path).toAbsolutePath
      // structured (path, mtime) key — a string key with a separator can
      // collide across paths (one path may be a prefix of another plus
      // any separator character, since '@' etc. are legal in paths)
      val key = (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis)
      // targeted eviction, never a blunt clear (which would re-parse every
      // hot file's ~15k lines once past the bound): first drop THIS path's
      // superseded-mtime entries (the refresh-in-place case the mtime key
      // exists for), then shed arbitrary single entries while still over
      // the bound — a service rotating across many distinct PSL files
      // loses some, never all
      fileCache.keySet.removeIf(k => k._1 == key._1 && k._2 != key._2)
      while (fileCache.size() > 64) {
        val it = fileCache.keySet().iterator()
        if (it.hasNext) fileCache.remove(it.next()) else return parseOne(p)
      }
      fileCache.computeIfAbsent(key, _ => parseOne(p))
    }

    private def parseOne(p: java.nio.file.Path): SuffixRules = {
      val src = scala.io.Source.fromFile(p.toString, "UTF-8")
      try parse(src.getLines())
      finally src.close()
    }

    private val fileCache =
      new java.util.concurrent.ConcurrentHashMap[(String, Long), SuffixRules]()

    /** The bundled sample PSL (a working subset of the real list —
      * common country registries plus the fixture-exercised wildcard and
      * exception rules). Production crawls should parse the full file:
      * `SuffixRules.parse(scala.io.Source.fromFile(path).getLines())`. */
    lazy val bundledSample: SuffixRules = {
      val in = getClass.getResourceAsStream("/graft/public_suffix_sample.dat")
      require(in != null, "bundled PSL sample resource missing")
      try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
      finally in.close()
    }
  }

  /** Lowercased host of a URL (userinfo and port dropped); null when the
    * input has no `scheme://host`. Same single-pass kernel as
    * [[normalizeUrl]]. */
  def urlHost(url: Column): Column = staticInvoke("host", url)

  /** Registered domain (site key for per-domain caps and URL-level stats):
    * the last two host labels, or the last THREE when the two-label tail
    * is a known multi-part public suffix (the bounded default set,
    * [[graft.functions.UrlKernels.DefaultMultiPartSuffixes]]; the full
    * PSL goes through the [[SuffixRules]] overload). Hosts
    * with fewer than two labels (and IPv4 literals, which have no
    * registry) pass through unchanged. Null-safe. Same single-pass kernel
    * family as [[normalizeUrl]] — row-local, codegen'd StaticInvoke. */
  def registeredDomain(host: Column): Column =
    staticInvoke("registeredDomainDefault", host)

  /** Registered domain under a caller-supplied [[SuffixRules]] (the full
    * PSL path — longest match, wildcards, exceptions). Same pass-through
    * semantics as the default overload for IPv4 / single-label / bare
    * suffix hosts. A deterministic scalar UDF rather than a Column
    * expression, priced deliberately: a full-PSL rule set is ~9k entries —
    * as an `isin`/CASE literal tree that is a megabyte of generated code
    * per task (the whole-stage compiler gives up), and as a lookup join it
    * is a per-row explode of candidate tails plus an aggregate exchange.
    * The UDF is row-local, shuffle-free, O(maxProbe) hash lookups per
    * host, and the rule set rides the task closure once. */
  def registeredDomain(host: Column, rules: SuffixRules): Column = {
    val f = udf((h: String) => rules.registeredDomainOf(h))
    f(host)
  }

  /** Registered domain straight from a URL column. */
  def urlRegisteredDomain(url: Column): Column =
    registeredDomain(urlHost(url))

  /** Registered domain from a URL column under caller-supplied rules. */
  def urlRegisteredDomain(url: Column, rules: SuffixRules): Column =
    registeredDomain(urlHost(url), rules)

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
    val dom = urlRegisteredDomain(col(urlCol))
    val blocked =
      if (blockedDomains.isEmpty) lit(false)
      else coalesce(dom.isin(blockedDomains.map(_.toLowerCase).toSeq: _*),
        lit(false))
    withScoreAndKeep(df.withColumn("url_blocked", blocked), urlCol,
      wordWeights, maxWordScore)
  }

  /** [[withUrlFilterSignals]] with the blocklist as a DATAFRAME — the
    * real-blocklist path (the public UT1 adult/malware set is ~3.7M
    * domains; as an `isin` literal that is a multi-million-node expression
    * tree serialized into every task, where this is one broadcast hash
    * relation). `blocklist(blocklistCol)` holds registered domains
    * (lowercased/trimmed here; blanks and nulls ignored); `url_blocked`
    * comes from a broadcast LEFT join on the url's registered domain —
    * the semi-join shape with the match surfaced as a boolean instead of
    * a filter, so the three output signals are identical to the
    * literal-set overload. The blocklist is deduped before the join
    * (row multiplication impossible). Keep the `Set` overload for small
    * curated lists — it stays a pure codegen'd expression. */
  def withUrlFilterSignals(df: DataFrame, urlCol: String,
                           blocklist: DataFrame, blocklistCol: String,
                           wordWeights: Map[String, Double],
                           maxWordScore: Double): DataFrame =
    withFilterSignalsOn(df, urlCol, urlRegisteredDomain(col(urlCol)),
      blocklist, blocklistCol, wordWeights, maxWordScore)

  /** DataFrame-blocklist filter under caller-supplied [[SuffixRules]] —
    * real blocklists (UT1) key on real-PSL registered domains, so the
    * membership test must use the same domain keying. */
  def withUrlFilterSignals(df: DataFrame, urlCol: String,
                           blocklist: DataFrame, blocklistCol: String,
                           wordWeights: Map[String, Double],
                           maxWordScore: Double,
                           rules: SuffixRules): DataFrame =
    withFilterSignalsOn(df, urlCol, urlRegisteredDomain(col(urlCol), rules),
      blocklist, blocklistCol, wordWeights, maxWordScore)

  private def withFilterSignalsOn(df: DataFrame, urlCol: String,
                                  domain: Column,
                                  blocklist: DataFrame, blocklistCol: String,
                                  wordWeights: Map[String, Double],
                                  maxWordScore: Double): DataFrame = {
    val bl = broadcast(
      blocklist.select(lower(trim(col(blocklistCol))).as("__bldom"))
        .filter(col("__bldom").isNotNull && col("__bldom") =!= "")
        .distinct())
    val blocked = df
      .withColumn("__fltdom", domain)
      .join(bl, col("__fltdom") === col("__bldom"), "left")
      .withColumn("url_blocked", col("__bldom").isNotNull)
      .drop("__fltdom", "__bldom")
    withScoreAndKeep(blocked, urlCol, wordWeights, maxWordScore)
  }

  /** Shared tail of the filter-signal overloads: the weighted word score
    * and the keep verdict over an input that already carries
    * `url_blocked`. */
  private def withScoreAndKeep(df: DataFrame, urlCol: String,
                               wordWeights: Map[String, Double],
                               maxWordScore: Double): DataFrame = {
    require(wordWeights.keys.forall(_.nonEmpty), "empty keyword")
    // keywords match against the LOWERCASED url — lowercase them too, or
    // a mixed-case keyword could never score; merging collisions keeps
    // the caller's intent ("Casino" + "casino" weights add)
    val weights = wordWeights.groupMapReduce(_._1.toLowerCase)(_._2)(_ + _)
    val low = lower(col(urlCol))
    val score = weights.foldLeft(lit(0.0)) { case (acc, (w, wt)) =>
      // occurrences(w) = (len(url) - len(url with w removed)) / len(w)
      acc + (length(low) - length(call_function("replace", low, lit(w), lit(""))))
        .cast("double") / w.length * wt
    }
    df.withColumn("url_word_score", coalesce(score, lit(0.0)))
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
                   orderCol: String): DataFrame =
    capPerDomainOn(df, urlRegisteredDomain(col(urlCol)), cap, orderCol)

  /** [[capPerDomain]] under caller-supplied [[SuffixRules]] (full-PSL
    * domain keying — `shop.example.com.pl` caps as `example.com.pl`, not
    * as the `com.pl` registry the literal default would merge entire
    * country registries into). */
  def capPerDomain(df: DataFrame, urlCol: String, cap: Int,
                   orderCol: String, rules: SuffixRules): DataFrame =
    capPerDomainOn(df, urlRegisteredDomain(col(urlCol), rules), cap, orderCol)

  private def capPerDomainOn(df: DataFrame, domain: Column, cap: Int,
                             orderCol: String): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val withDom = df.withColumn("__dom", domain)
      .filter(col("__dom").isNotNull)
      .withColumn("__ord", col(orderCol).cast("double"))
    graft.operators.TopK.grouped(withDom, "__dom", "__ord", orderCol, cap)
      .drop("__dom", "__ord")
  }
}
