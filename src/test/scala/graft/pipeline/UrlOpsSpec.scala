package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def norm(urls: (String, String)*): Unit = {
    import spark.implicits._
    val got = UrlOps.normalizeUrl(col("u"))
    urls.zipWithIndex.foreach { case ((in, want), i) =>
      val out = Seq(Option(in)).toDF("u").select(got).head()
      val v = if (out.isNullAt(0)) null else out.getString(0)
      assert(v == want, s"case $i: $in → $v (want $want)")
    }
  }

  test("normalizeUrl: scheme/host case, ports, userinfo, fragment, tracking params") {
    norm(
      "https://Example.COM/Path" -> "https://example.com/Path", // path case kept
      "HTTPS://example.com:443/a" -> "https://example.com/a",
      "http://example.com:80/" -> "http://example.com",
      "http://example.com:8080/a" -> "http://example.com:8080/a", // non-default port kept
      "https://example.com:80/a" -> "https://example.com:80/a", // 80 is not https default
      "https://user:pw@example.com/a" -> "https://example.com/a",
      "https://example.com/a#section" -> "https://example.com/a",
      "https://example.com/a?utm_source=tw&x=1&utm_campaign=c&y=2" ->
        "https://example.com/a?x=1&y=2", // param order preserved
      "https://example.com/a?utm_source=tw" -> "https://example.com/a", // emptied query loses '?'
      "https://example.com/a?fbclid=1&gclid=2&msclkid=3" -> "https://example.com/a",
      "https://example.com/a/b///" -> "https://example.com/a/b", // trailing slashes
      "https://example.com/" -> "https://example.com",
      "  https://example.com/a  " -> "https://example.com/a", // trimmed
      "not a url" -> null,
      "example.com/no-scheme" -> null,
      "https://" -> null) // scheme but no host
    // null-safe
    import spark.implicits._
    assert(Seq(Option.empty[String]).toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).head().isNullAt(0))
  }

  test("normalizeUrl: tracking-param strip is case-insensitive and covers valueless params") {
    norm(
      "https://example.com/a?UTM_SOURCE=x&y=2" -> "https://example.com/a?y=2",
      "https://example.com/a?Fbclid=9" -> "https://example.com/a",
      "https://example.com/a?utm_source&y=2" -> "https://example.com/a?y=2", // valueless
      "https://example.com/a?UTM_CAMPAIGN" -> "https://example.com/a",
      // param VALUES keep their case; a non-tracking name that merely
      // CONTAINS a tracking name is kept
      "https://example.com/a?q=UTM_SOURCE&xutm_source=1" ->
        "https://example.com/a?q=UTM_SOURCE&xutm_source=1")
  }

  test("normalizeUrl is idempotent on its own output") {
    import spark.implicits._
    val messy = Seq(
      "https://User@Example.COM:443/a/b/?utm_source=x&q=1#f",
      "HTTP://a.b.C:80/", "https://h/x?fbclid=9&z=2")
    val once = messy.toDF("u").select(UrlOps.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("u").select(UrlOps.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice)
  }

  test("registeredDomain: two labels, multi-part suffixes, IPv4, degenerate hosts") {
    import spark.implicits._
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.c.example.com" -> "example.com",
      "news.bbc.co.uk" -> "bbc.co.uk",
      "bbc.co.uk" -> "bbc.co.uk",
      "co.uk" -> "co.uk", // a bare suffix has no registrant — pass through
      "shop.example.com.au" -> "example.com.au",
      "192.168.0.1" -> "192.168.0.1", // IPv4: no registry
      "localhost" -> "localhost")
    cases.foreach { case (host, want) =>
      val got = Seq(host).toDF("h")
        .select(UrlOps.registeredDomain(col("h"))).head().getString(0)
      assert(got == want, s"$host → $got (want $want)")
    }
    assert(Seq(Option.empty[String]).toDF("h")
      .select(UrlOps.registeredDomain(col("h"))).head().isNullAt(0))
  }

  test("SuffixRules.parse reads the PSL file format; matcher covers wildcard/exception/longest") {
    val rules = UrlOps.SuffixRules.parse(Seq(
      "// comment line", "", "  ", "com.PL  trailing junk", "co.uk",
      "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp",
      "blogspot.com", "*").iterator)
    assert(rules.plain == Set("com.pl", "co.uk", "blogspot.com"))
    assert(rules.wildcard == Set("ck", "kawasaki.jp"))
    assert(rules.exception == Set("www.ck", "city.kawasaki.jp"))
    val cases = Seq(
      "www.example.com.pl" -> "example.com.pl", // PSL-only registry suffix
      "com.pl" -> "com.pl", // bare suffix: no registrant
      "a.b.site.foo.ck" -> "site.foo.ck", // *.ck wildcard
      "sub.www.ck" -> "www.ck", // !www.ck exception prevails over *.ck
      "www.ck" -> "www.ck",
      "deep.sub.x.kawasaki.jp" -> "sub.x.kawasaki.jp", // higher-order wildcard
      "a.city.kawasaki.jp" -> "city.kawasaki.jp", // exception under it
      "me.blogspot.com" -> "me.blogspot.com", // private registry
      "x.y.site.example" -> "site.example", // implicit default rule
      "192.168.0.1" -> "192.168.0.1",
      "localhost" -> "localhost")
    cases.foreach { case (host, want) =>
      val got = rules.registeredDomainOf(host)
      assert(got == want, s"$host → $got (want $want)")
    }
    assert(rules.registeredDomainOf(null) == null)
  }

  test("trailing-dot FQDN hosts key identically on the rules and default paths") {
    // Scala's split(Char) drops trailing empty labels — the rules path
    // must split with limit -1 so a trailing-dot host sees the same
    // label sequence as the default kernel (and the old Column stack,
    // whose split(..., -1) kept it). Divergence here keys the SAME url
    // under different domains depending on the overload used.
    val rules = UrlOps.SuffixRules.bundledSample
    for (host <- Seq("news.bbc.co.uk.", "a.b.example.com.", "x.",
                     "example.com.pl.")) {
      val viaRules = rules.registeredDomainOf(host)
      val viaDefault =
        graft.functions.UrlKernels.registeredDomainDefaultJava(host)
      // PSL rules are dot-clean, so a trailing-dot host matches none of
      // them and BOTH paths degrade to the same implicit-default answer
      // — identical keying is the contract, not PSL awareness of FQDNs
      assert(viaRules == viaDefault, s"$host: $viaRules vs $viaDefault")
    }
  }

  test("the constant default set gets a PSL-only suffix WRONG; the rules path gets it right") {
    import spark.implicits._
    // com.pl is a registry suffix the bounded literal set does not carry:
    // the default path keys the whole Polish commercial registry as one
    // "domain" — exactly the silent site-merging the PSL path exists for
    val df = Seq("shop.example.com.pl", "other.site.com.pl").toDF("h")
    val wrong = df.select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSet
    assert(wrong == Set("com.pl"))
    val right = df.select(UrlOps.registeredDomain(col("h"),
        UrlOps.SuffixRules.bundledSample))
      .collect().map(_.getString(0)).toSet
    assert(right == Set("example.com.pl", "site.com.pl"))
  }

  test("bundled-sample rules agree with the default Column path on constant-set hosts") {
    import spark.implicits._
    val hosts = Seq("www.example.com", "a.b.c.example.com", "news.bbc.co.uk",
      "bbc.co.uk", "co.uk", "shop.example.com.au", "192.168.0.1",
      "localhost", "x.co.jp", "sub.site.com.tw")
    val df = hosts.toDF("h")
    val viaColumn = df.select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    val viaRules = df.select(UrlOps.registeredDomain(col("h"),
        UrlOps.SuffixRules.bundledSample))
      .collect().map(_.getString(0)).toSeq
    assert(viaColumn == viaRules, s"$viaColumn vs $viaRules")
  }

  test("the REAL full publicsuffix.org list (vendored fixture): rules the sample lacks resolve correctly") {
    import spark.implicits._
    // the vendored full list (test fixture, MPL-2.0 public data; the
    // bundled 214-rule sample stays the shipped default)
    val res = getClass.getResource("/graft/public_suffix_full.dat")
    assert(res != null, "vendored full PSL fixture missing")
    val full = UrlOps.SuffixRules.parseFile(
      java.nio.file.Paths.get(res.toURI).toString)
    assert(full.plain.size + full.wildcard.size > 9000,
      s"expected ~9.5k rules, got ${full.plain.size + full.wildcard.size}")
    assert(full.exception.nonEmpty)
    val sample = UrlOps.SuffixRules.bundledSample
    // rules present ONLY in the full file — the cases a production crawl
    // hits that the sample cannot know
    assert(!sample.plain.contains("kobierzyce.pl") && full.plain.contains("kobierzyce.pl"))
    assert(!sample.plain.contains("pvt.k12.ma.us") && full.plain.contains("pvt.k12.ma.us"))
    def domUnder(rules: UrlOps.SuffixRules, host: String): String = {
      val r = Seq(host).toDF("h")
        .select(UrlOps.registeredDomain(col("h"), rules)).head()
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // under the full rules, shop.kobierzyce.pl is a REGISTRABLE name one
    // under the Polish municipal registry; the sample (which only knows
    // pl/com.pl) collapses it to kobierzyce.pl — whole-registry pooling
    assert(domUnder(full, "a.shop.kobierzyce.pl") == "shop.kobierzyce.pl")
    assert(domUnder(sample, "a.shop.kobierzyce.pl") == "kobierzyce.pl")
    // a 4-label public suffix, full file only
    assert(domUnder(full, "x.district.pvt.k12.ma.us") == "district.pvt.k12.ma.us")
    // wildcard + exception semantics keep working at full-file size
    assert(domUnder(full, "a.b.ck") == "a.b.ck") // *.ck: b.ck is a suffix
    assert(domUnder(full, "sub.www.ck") == "www.ck") // !www.ck exception
    // both files live in the mtime-keyed cache simultaneously (targeted
    // eviction, not clear-all): re-parse is a cache hit returning the
    // SAME instance
    val again = UrlOps.SuffixRules.parseFile(
      java.nio.file.Paths.get(res.toURI).toString)
    assert(again eq full, "full-PSL cache entry evicted by an unrelated parse")
  }

  test("blocklist-DataFrame overload produces the same signals as the literal-set overload") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://news.blocked.com/a?x=1"),
      (2L, "https://ok.example.org/casino/page"),
      (3L, "https://Sub.Blocked.COM:443/b"),
      (4L, "not a url"),
      (5L, "https://also.bad.co.uk/z")).toDF("id", "url")
    val viaSet = UrlOps.withUrlFilterSignals(rows, "url",
      blockedDomains = Set("blocked.com", "bad.co.uk"),
      wordWeights = Map("casino" -> 2.0), maxWordScore = 1.0)
    val bl = Seq(" Blocked.com", "bad.CO.UK ", "", "unmatched.net")
      .toDF("dom")
    val viaDf = UrlOps.withUrlFilterSignals(rows, "url",
      blocklist = bl, blocklistCol = "dom",
      wordWeights = Map("casino" -> 2.0), maxWordScore = 1.0)
    val a = viaSet.orderBy("id").collect().map(_.toSeq).toSeq
    val b = viaDf.select(viaSet.columns.map(col).toIndexedSeq: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b, s"$a vs $b")
    assert(a.map(r => r.head -> r(2)).toMap ==
      Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
  }

  test("kernel fuzz: adversarial and random inputs never throw; null or a string comes back") {
    import spark.implicits._
    val adversarial = Seq(
      "", " ", "#", "://", "http://", "https://@", "https://:80",
      "https://h:", "https://h:80:90/p", "https://h:08/p", "https://h?",
      "https://h?&&&", "https://h?=v", "https://h?utm_", "https://h/p#f#g",
      "a+b-c.d://h/p", "https://user@pass@h/p", "https://h//p//",
      "https://..", "https://h?a=1&utm_source&b=2&FBCLID=x",
      "ftp://h:21/f", "https://[::1]:443/v6", "https://192.168.0.1:8080/x",
      "https://xn--bcher-kva.example/päth?ö=ü#frag",
      "\u0000://h", "https://h\u0000/p", "https://ह.example/p",
      // line terminators: the old regex $/.-anchors silently ignored what
      // followed them (an anchor accident); the kernel treats them as
      // ordinary bytes — deliberate divergence, pinned here
      "https://h/p#a\nb", "https://h/p?a=1\n&utm_source=x",
      "https://h\n/p", "https://1.2.3.4\n/p", "https://h/p?utm_a\n")
    val rnd = new scala.util.Random(99)
    val ctl = Array('\n', '\t', '\r')
    val random = Seq.fill(200)(new String(Array.fill(rnd.nextInt(40))(
      if (rnd.nextInt(12) == 0) ctl(rnd.nextInt(3))
      else (rnd.nextInt(96) + 32).toChar)))
    val rows = (adversarial ++ random).map(Option(_)) :+ Option.empty[String]
    // through the real Spark path (codegen'd StaticInvoke), all three
    // kernels at once — must complete, no exceptions
    val out = rows.toDF("u").select(
      UrlOps.normalizeUrl(col("u")).as("n"),
      UrlOps.urlHost(col("u")).as("h"),
      UrlOps.urlRegisteredDomain(col("u")).as("d"),
      UrlOps.registeredDomain(col("u"), UrlOps.SuffixRules.bundledSample).as("p"))
      .collect()
    assert(out.length == rows.length)
    // normalization is still idempotent on whatever survives the fuzz
    val survived = out.flatMap(r => Option(r.getString(0))).toSeq
    val twice = survived.toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).collect().map(_.getString(0)).toSeq
    assert(survived == twice)
  }

  test("blocklist filter under SuffixRules keys membership on the PSL domain") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://a.shop.com.pl/x"), // PSL domain shop.com.pl — blocked
      (2L, "https://b.other.com.pl/y"), // other.com.pl — clean
      (3L, "https://c.shop.com.pl/z")).toDF("id", "url")
    val bl = Seq("shop.com.pl").toDF("dom")
    val withRules = UrlOps.withUrlFilterSignals(rows, "url",
        blocklist = bl, blocklistCol = "dom",
        wordWeights = Map.empty[String, Double], maxWordScore = 1.0,
        rules = UrlOps.SuffixRules.bundledSample)
      .select("id", "url_blocked").as[(Long, Boolean)].collect().toMap
    assert(withRules == Map(1L -> true, 2L -> false, 3L -> true))
    // the default-set path keys ALL of them as 'com.pl' ≠ 'shop.com.pl' —
    // a real UT1 list (PSL-keyed) would silently never match
    val withDefault = UrlOps.withUrlFilterSignals(rows, "url",
        blocklist = bl, blocklistCol = "dom",
        wordWeights = Map.empty[String, Double], maxWordScore = 1.0)
      .select("id", "url_blocked").as[(Long, Boolean)].collect().toMap
    assert(withDefault.values.forall(_ == false))
  }

  test("urlHost routes through userinfo/port; non-URLs are null") {
    import spark.implicits._
    val got = Seq("https://u@WWW.Site.COM:8443/a?x#f").toDF("u")
      .select(UrlOps.urlHost(col("u"))).head().getString(0)
    assert(got == "www.site.com")
    assert(Seq("no scheme here").toDF("u")
      .select(UrlOps.urlHost(col("u"))).head().isNullAt(0))
  }

  test("dedupByUrl: one survivor per NORMALIZED url, keep-oldest, non-URLs drop") {
    import spark.implicits._
    val rows = Seq(
      (3L, "https://A.com/x?utm_source=t#f"), // normalizes same as id 7
      (7L, "https://a.com/x"),
      (1L, "HTTPS://a.com:443/x"), // also the same — oldest, wins
      (5L, "https://a.com/y"), // distinct path: kept
      (9L, "not a url")) // dropped
      .toDF("id", "url").repartition(3)
    val kept = UrlOps.dedupByUrl(rows, "url", "id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"got $kept")
  }

  test("capPerDomain keeps the cap lowest-order rows per domain, drops non-URLs") {
    import spark.implicits._
    val rows = (0L until 30L).map { i =>
      val url =
        if (i % 10 == 9) s"garbage $i" // undomained: dropped
        else s"https://site${i % 3}.example${i % 3}.com/p$i"
      (i, url)
    }
    val df = rows.toDF("id", "url").repartition(7)
    val kept = UrlOps.capPerDomain(df, "url", cap = 2, orderCol = "id")
      .collect().map(_.getLong(0)).toSet
    // domains example{0,1,2}.com: member ids are i%3==d minus the i%10==9
    // rows; the 2 lowest ids of each survive
    val want = (0 to 2).flatMap { d =>
      (0L until 30L).filter(i => i % 3 == d && i % 10 != 9).sorted.take(2)
    }.toSet
    assert(kept == want, s"got $kept want $want")
  }
}
