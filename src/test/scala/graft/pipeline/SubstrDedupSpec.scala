package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstrDedupSpec extends SparkSpec {

  private def spans(rows: Seq[(Long, String)], L: Int, minCount: Int = 2) = {
    import spark.implicits._
    SubstrDedup.dupSpans(rows.toDF("id", "text"), "id", "text", L, minCount)
      .orderBy("id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def clean(rows: Seq[(Long, String)], L: Int, minCount: Int = 2) = {
    import spark.implicits._
    SubstrDedup.dedupSubstrings(rows.toDF("id", "text"), "id", "text", L, minCount)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("a shared boilerplate substring is cut from ALL docs (including the first)") {
    val boiler = "0123456789abcdefghij" // 20 chars
    val docs = Seq(
      1L -> s"unique-head-one $boiler unique-tail-one",
      2L -> s"two-prefix-text $boiler two-suffix-text",
      3L -> "a wholly distinct document with no duplication at all")
    val got = clean(docs, L = 20)
    // the boilerplate occurs at char 17 (1-based) in both docs; windows at
    // 17..21 all duplicate (" 0123…j " context differs, but the 20-char
    // exact-equal windows span the shared region), so the merged span
    // covers the shared " $boiler " region in each
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(!got(0)._2.contains(boiler) && !got(1)._2.contains(boiler))
    assert(got(0)._2.startsWith("unique-head-one") && got(0)._2.endsWith("unique-tail-one"))
    assert(got(2)._2 == docs(2)._2 && got(2)._3 == 0L && got(2)._4 == 0L)
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // a 30-char duplicated block with L=25 marks starts p..p+5 in each doc;
    // islands merge them into ONE span of exactly 30 chars
    val block = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123" // 30 chars
    val docs = Seq(
      1L -> s"xxxxx${block}yyyyy",
      2L -> s"qqqqqqqqqq${block}rrrrr")
    val got = spans(docs, L = 25)
    assert(got == Seq((1L, 6L, 35L), (2L, 11L, 40L)))
    val cl = clean(docs, L = 25)
    assert(cl(0)._2 == "xxxxxyyyyy" && cl(0)._3 == 1L && cl(0)._4 == 30L)
    assert(cl(1)._2 == "qqqqqqqqqqrrrrr")
  }

  test("a wholly-duplicated document cleans to the empty string") {
    val t = "this entire document is duplicated verbatim twice in the corpus"
    val docs = Seq(1L -> t, 2L -> t, 3L -> "completely different other text here")
    val got = clean(docs, L = 20)
    assert(got(0)._2 == "" && got(1)._2 == "")
    assert(got(0)._4 == t.length.toLong)
    assert(got(2)._2 == docs(2)._2)
  }

  test("within-doc repetition is cut too (both copies)") {
    val rep = "repeated-inner-phrase-block!" // 28 chars, twice in ONE doc
    val docs = Seq(1L -> s"aa $rep bb $rep cc", 2L -> "unrelated second document text")
    val got = clean(docs, L = 28)
    assert(!got(0)._2.contains(rep))
    // the shared flanking spaces extend each duplicated window run by one
    // char on each side: spans are [3,32] and [35,64], cutting " rep "
    // both times → "aa"+"bb"+"cc"
    assert(got(0)._2 == "aabbcc")
    assert(got(0)._3 == 2L && got(0)._4 == 60L)
  }

  test("minCount=3 keeps a twice-occurring substring") {
    val boiler = "0123456789abcdefghij"
    val twice = Seq(1L -> s"aaaa $boiler bbbb", 2L -> s"cccc $boiler dddd",
      3L -> "something else entirely here")
    assert(clean(twice, L = 20, minCount = 3).forall(_._3 == 0L))
    val thrice = twice.take(2) ++ Seq(3L -> s"eeee $boiler ffff")
    val got = clean(thrice, L = 20, minCount = 3)
    assert(got.forall(r => !r._2.contains(boiler)))
  }

  test("keepFirst preserves the corpus-wide first occurrence of a shared block") {
    import spark.implicits._
    val boiler = "0123456789abcdefghijklmno" // 25 chars
    // heads end in distinct chars (d/u/n) so no cross-doc gram extends
    // past the shared "-doc-head <boiler> " region asymmetrically
    val docs = Seq(
      1L -> s"red-doc-head $boiler red-doc-tail",
      2L -> s"blu-doc-head $boiler blu-doc-tail",
      3L -> s"grn-doc-head $boiler grn-doc-tail")
    val got = docs.toDF("id", "text")
      .transform(d => SubstrDedup.dedupSubstrings(d, "id", "text", 25,
        keepFirst = true))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 1 keeps its text verbatim (every duplicated gram first occurs
    // there); docs 2 and 3 lose the block PLUS the shared "-doc-head "
    // flank that rides in the same duplicated windows
    assert(got(0)._2 == docs.head._2 && got(0)._3 == 0L)
    assert(!got(1)._2.contains(boiler) && !got(2)._2.contains(boiler))
    assert(got(1)._2 == "blublu-doc-tail")
    assert(got(2)._2 == "grngrn-doc-tail")
  }

  test("keepFirst: wholly-duplicated pair keeps the first doc, empties the second") {
    import spark.implicits._
    val t = "this entire document is duplicated verbatim twice in the corpus"
    val docs = Seq(2L -> t, 9L -> t).toDF("id", "text")
    val got = SubstrDedup.dedupSubstrings(docs, "id", "text", 20,
        keepFirst = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got(0) == (2L, t)) // min id wins
    assert(got(1) == (9L, ""))
  }

  test("keepFirst: within-doc repetition keeps the first copy") {
    import spark.implicits._
    val rep = "repeated-inner-phrase-block!" // 28 chars, twice in ONE doc
    val docs = Seq(1L -> s"aa $rep bb $rep cc").toDF("id", "text")
    val got = SubstrDedup.dedupSubstrings(docs, "id", "text", 28,
        keepFirst = true).collect()
    assert(got(0).getString(1) == s"aa $rep bbcc")
    assert(got(0).getLong(2) == 1L && got(0).getLong(3) == 30L)
  }

  test("token granularity: shared token runs are cut; survivors rejoin with single spaces") {
    import spark.implicits._
    // the flanking tokens differ on BOTH sides (one/two before, aaa/bbb
    // after) so the duplicated region is exactly the 6 shared tokens
    val docs = Seq(
      1L -> "intro one the shared run of tokens here aaa one",
      2L -> "intro two the shared run of tokens here bbb two",
      3L -> "a wholly different set of words entirely now").toDF("id", "text")
    val got = SubstrDedup.dedupTokenSubstrings(docs, "id", "text",
        minTokens = 4).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "the shared run of tokens here" (6 tokens) duplicates; windows of 4
    // inside it mark token positions 3..5 in both docs -> span [3, 8]
    assert(got(0)._2 == "intro one aaa one" && got(0)._3 == 1L && got(0)._4 == 6L)
    assert(got(1)._2 == "intro two bbb two")
    assert(got(2)._2 == docs.collect()(2).getString(1) && got(2)._4 == 0L)
  }

  test("token granularity: whitespace normalizes ONLY on affected docs") {
    import spark.implicits._
    val block = "alpha beta gamma delta eps"
    val docs = Seq(
      1L -> s"keep  double  spaces here with $block inside",
      2L -> s"other   doc also carries $block too",
      3L -> "untouched  doc   with  odd   spacing").toDF("id", "text")
    val got = SubstrDedup.dedupTokenSubstrings(docs, "id", "text",
        minTokens = 5).orderBy("id").collect()
    assert(got(0).getString(1) == "keep double spaces here with inside")
    assert(got(1).getString(1) == "other doc also carries too")
    assert(got(2).getString(1) == "untouched  doc   with  odd   spacing") // verbatim
  }

  test("token granularity: keepFirst retains the first doc's copy") {
    import spark.implicits._
    val docs = Seq(
      5L -> "x1 x2 c1 c2 c3 c4 c5 y1",
      9L -> "z1 z2 c1 c2 c3 c4 c5 w1").toDF("id", "text")
    val got = SubstrDedup.dedupTokenSubstrings(docs, "id", "text",
        minTokens = 5, keepFirst = true).orderBy("id").collect()
    assert(got(0).getString(1) == "x1 x2 c1 c2 c3 c4 c5 y1") // min id kept
    assert(got(1).getString(1) == "z1 z2 w1")
    assert(got(1).getLong(3) == 5L)
  }

  test("token granularity: marked set equals the brute-force definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 80L).map(i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val L = 6
    val marked = SubstrDedup.markedTokenPositions(
        docs.toDF("id", "text"), "id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grams = docs.flatMap { case (id, t) =>
      val ts = t.split("\\s+").filter(_.nonEmpty)
      (1 to ts.length - L + 1).map(p =>
        (ts.slice(p - 1, p - 1 + L).mkString(" "), (id, p.toLong)))
    }
    val dupPos = grams.groupBy(_._1).filter(_._2.size >= 2)
      .values.flatten.map(_._2).toSet
    assert(marked == dupPos)
  }

  test("supplementary-plane chars: marked set matches the CODEPOINT brute force; cut is surrogate-safe") {
    import spark.implicits._
    val emo = new String(Character.toChars(0x1F600)) // 1 codepoint, 2 UTF-16 units
    val rnd = new scala.util.Random(31)
    val vocab = Vector("spark", "scan", "join", emo, "agg", s"x${emo}y")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val L = 12
    val marked = SubstrDedup.markedPositions(docs.toDF("id", "text"), "id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force in CODEPOINT space — the indexing world of Spark/DuckDB substr
    val grams = docs.flatMap { case (id, t) =>
      val cps = t.codePoints().toArray
      (1 to cps.length - L + 1).map(p =>
        (new String(cps, p - 1, L), (id, p.toLong)))
    }
    val dupPos = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten.map(_._2).toSet
    assert(marked == dupPos)
    // the cut must never split a surrogate pair: every output is a valid
    // round-trippable string with intact emoji codepoints
    val cleaned = SubstrDedup.dedupSubstrings(docs.toDF("id", "text"), "id", "text", L)
      .collect().map(_.getString(1))
    cleaned.foreach { s =>
      var i = 0
      while (i < s.length) {
        assert(!Character.isLowSurrogate(s.charAt(i)),
          s"dangling low surrogate at $i in '$s'") // high must precede
        if (Character.isHighSurrogate(s.charAt(i))) {
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)))
          i += 2
        } else i += 1
      }
    }
  }

  test("short and null texts pass through untouched") {
    import spark.implicits._
    val df = Seq((1L, Some("tiny")), (2L, None), (3L, Some("also tiny")))
      .toDF("id", "text")
    val got = SubstrDedup.dedupSubstrings(df, "id", "text", 20)
      .orderBy("id").collect()
    assert(got(0).getString(1) == "tiny")
    assert(got(1).isNullAt(1))
    assert(got.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("self-sizing: partition count follows the 24B/char formula and the conf restores") {
    import spark.implicits._
    // formula arithmetic: grow-only above the session setting
    val cur = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(SubstrDedup.positionShufflePartitions(spark, 0L) == cur)
    assert(SubstrDedup.positionShufflePartitions(spark, 1000L) == cur)
    // 10 GB of position rows at 256 MB target → 960 partitions
    val chars10g = (10L << 30) / 24L
    assert(SubstrDedup.positionShufflePartitions(spark, chars10g) ==
      math.max(cur, math.ceil(chars10g * 24.0 / (256L << 20)).toInt))
    spark.conf.set("spark.graft.substr.targetPartitionBytes", "1024")
    try {
      // tiny target forces the sized path even on a spec corpus…
      val docs = Seq(1L -> ("shared boilerplate block here " * 3 + "alpha tail"),
                     2L -> ("shared boilerplate block here " * 3 + "beta tail"))
      assert(SubstrDedup.positionShufflePartitions(spark,
        docs.map(_._2.length.toLong).sum) > cur)
      // …and the result is still exact, with the session conf restored after
      val got = SubstrDedup.dedupSubstrings(docs.toDF("id", "text"),
        "id", "text", 30).collect()
      assert(got.forall(_.getLong(2) > 0)) // both docs lose the shared block
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt == cur,
        "scoped shuffle-partition override leaked into the session")
    } finally spark.conf.unset("spark.graft.substr.targetPartitionBytes")
  }

  test("scoped session CLONES caller runtime confs (newSession would drop them)") {
    // the position pass runs under a cloned child session; runtime confs
    // the caller set via spark.conf.set must carry over — newSession()
    // rebuilds SQLConf from SparkConf defaults and silently drops them
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "12345678")
    try {
      val cloned = org.apache.spark.sql.GraftBridge.cloneSession(spark)
      assert(cloned.conf.get("spark.sql.autoBroadcastJoinThreshold") == "12345678")
      val fresh = spark.newSession()
      assert(fresh.conf.get("spark.sql.autoBroadcastJoinThreshold") != "12345678",
        "newSession unexpectedly inherits runtime confs — clone no longer needed?")
      // and the clone's overrides stay scoped
      cloned.conf.set("spark.sql.shuffle.partitions", "7")
      assert(spark.conf.get("spark.sql.shuffle.partitions") != "7")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioning-invariant and idempotent-after-cut on the marked set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "scan", "join", "agg", "sort", "hash", "row",
      "col", "key", "val")
    def doc(i: Long) = (i, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (1L to 60L).map(doc)
    val a = clean(docs, L = 25)
    val b = {
      val df = docs.toDF("id", "text").repartition(13, col("id"))
      SubstrDedup.dedupSubstrings(df, "id", "text", 25).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(a == b)
    // every ORIGINAL surviving position really is unique-gram: no window of
    // the original text that survived the cut occurs twice in the corpus
    // (the cut can only remove marked positions, never keep one)
    val marked = SubstrDedup.markedPositions(docs.toDF("id", "text"), "id", "text", 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grams = docs.flatMap { case (id, t) =>
      (1 to t.length - 24).map(p => (t.substring(p - 1, p - 1 + 25), (id, p.toLong)))
    }
    val dupPos = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten.map(_._2).toSet
    assert(marked == dupPos) // exact vs the brute-force definition
  }
}
