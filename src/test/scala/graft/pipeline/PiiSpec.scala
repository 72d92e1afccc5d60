package graft.pipeline

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private def scrub(texts: Seq[String]) = {
    import spark.implicits._
    TextAnalysis.piiScrub(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"), "text")
      .orderBy("id")
      .select("redacted", "n_emails", "n_ipv4", "n_phones")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("piiScrub redacts emails, IPv4s and phones with correct counts") {
    val out = scrub(Seq(
      "reach bob.smith+tag@corp.example.com or alice@ex.org today",
      "server at 192.168.0.1 and 10.0.255.7.",
      "call +1-555-1234 or +44-020-7946",
      "clean text with no pii at all",
      "mixed: a@b.co from 8.8.8.8 dial +1-555-0000"))
    assert(out(0) == ("reach <EMAIL> or <EMAIL> today", 2L, 0L, 0L))
    assert(out(1) == ("server at <IP> and <IP>.", 0L, 2L, 0L))
    assert(out(2) == ("call <PHONE> or <PHONE>", 0L, 0L, 2L))
    assert(out(3) == ("clean text with no pii at all", 0L, 0L, 0L))
    assert(out(4) == ("mixed: <EMAIL> from <IP> dial <PHONE>", 1L, 1L, 1L))
  }

  test("piiScrub near-misses stay untouched") {
    val out = scrub(Seq(
      "a@b has no tld and 1.2.3 is not an ipv4",
      "version 1.2.3.4.5 embeds an ipv4-looking run", // \b lets 1.2.3.4 match
      "price +1-55-12 is not a phone"))
    assert(out(0)._1 == "a@b has no tld and 1.2.3 is not an ipv4")
    assert(out(0)._2 == 0L && out(0)._3 == 0L && out(0)._4 == 0L)
    // documented greedy behavior: the first 4 octets of a longer dotted run
    // match (same in RE2 and Java regex — parity is what the oracle checks)
    assert(out(1)._3 == 1L)
    assert(out(2) == ("price +1-55-12 is not a phone", 0L, 0L, 0L))
  }

  test("piiScrub is idempotent: scrubbing scrubbed text changes nothing") {
    import spark.implicits._
    val once = scrub(Seq("x bob@example.com y 1.2.3.4 z +1-555-9999"))
    val twice = scrub(Seq(once(0)._1))
    assert(twice(0)._1 == once(0)._1)
    assert(twice(0)._2 == 0L && twice(0)._3 == 0L && twice(0)._4 == 0L)
  }
}
