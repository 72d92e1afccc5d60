package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — Xie et al.,
  * NeurIPS 2023 (arXiv:2302.03169): select raw-corpus documents whose
  * hashed-n-gram feature distribution looks like a target corpus.
  *
  *  1. Features: lowercase word unigrams + bigrams, hashed into
  *     `16^hexChars` buckets (md5 hex prefix — the same engine-portable
  *     hash family the sampling/dedup operators use).
  *  2. Fit two bag-of-buckets unigram models with Laplace smoothing —
  *     `p` on the target corpus, `q` on the raw corpus — keeping only the
  *     per-bucket log ratio `ln p[b] − ln q[b]`.
  *  3. Per document: importance weight = Σ over its features (in text
  *     order) of the bucket log ratio.
  *  4. Resample: top-n by `weight + Gumbel(id)` — Gumbel-top-k sampling
  *     without replacement, the paper's §2.2 estimator, derandomized by
  *     deriving the uniform from md5 of the document id.
  *
  * Scale posture (100 TB): model fitting aggregates to AT MOST
  * `16^hexChars` buckets (partial map-side combine; a few-KB shuffle),
  * then the bounded ratio table rides a broadcast into a row-local
  * scoring pass — the raw corpus is scanned once, never shuffled (the
  * final top-n is a TakeOrdered, survivors only). A broadcast hash map
  * beats a `typedLit` map literal here because Catalyst's map-literal
  * lookup is a linear scan per feature while the scoring loop needs O(1)
  * per feature (same tradeoff as [[TextAnalysis.withTrigramLogLoss]]).
  *
  * The reference has no data-selection operator; this extends the engine
  * for the training-data-pipeline tier (same category as
  * [[Dedup]]/[[CorpusPipeline]]).
  */
object Dsir {

  /** Bounded log-ratio model: `ratios` holds every bucket seen in either
    * corpus (≤ 16^hexChars entries); `default` is the smoothed ratio of a
    * bucket seen in neither. */
  final case class RatioModel(ratios: Map[String, Double], default: Double,
                              hexChars: Int) {
    require(ratios.size <= (1 << (4 * hexChars)),
      s"ratio table ${ratios.size} exceeds bucket space 16^$hexChars")
  }

  /** Whitespace tokens of the lowercased text — the corpus-wide tokenizer
    * contract shared with [[Dedup]]/[[TextAnalysis]]. */
  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Hashed features IN TEXT ORDER: unigrams, then adjacent-pair bigrams
    * (`"a b"`). Order matters — the scoring fold and its DuckDB oracle
    * sum per-feature doubles left-to-right. */
  def features(text: Column): Column = {
    val t = toks(text)
    val n1 = greatest(size(t) - 1, lit(0))
    val bigrams = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    concat(t, bigrams)
  }

  /** Feature bucket as an md5 hex prefix — identical in Spark SQL, the
    * JVM scorer below, and DuckDB's `md5()`. */
  def bucket(feature: Column, hexChars: Int): Column =
    substring(md5(feature.cast("binary")), 1, hexChars)

  // MessageDigest is stateful and not thread-safe; executors re-initialize
  // this per JVM (object init), one instance per task thread.
  private val mdTl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def bucketOf(feature: String, hexChars: Int): String = {
    val md = mdTl.get()
    md.reset()
    val d = md.digest(feature.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(hexChars)
    var i = 0
    while (sb.length < hexChars) {
      val b = d(i) & 0xff
      sb.append(Character.forDigit(b >> 4, 16))
      if (sb.length < hexChars) sb.append(Character.forDigit(b & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  private def bucketCounts(df: DataFrame, textCol: String,
                           hexChars: Int): Map[String, Long] =
    df.select(explode(features(col(textCol))).as("f"))
      .select(bucket(col("f"), hexChars).as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Fit the smoothed per-bucket log ratio `ln p_target − ln q_raw`.
    * Both aggregations reduce to ≤ 16^hexChars rows before the driver
    * sees them (hexChars is capped so the collect is bounded by
    * construction, not by data). */
  def fitLogRatios(raw: DataFrame, target: DataFrame, textCol: String,
                   hexChars: Int = 2, alpha: Double = 1.0): RatioModel = {
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars=$hexChars out of range [1,4] (bucket table must stay driver-resident)")
    require(alpha > 0.0, "alpha must be positive (unsmoothed ratios are unbounded)")
    val nBuckets = 1L << (4 * hexChars)
    val tgt = bucketCounts(target, textCol, hexChars)
    val rawC = bucketCounts(raw, textCol, hexChars)
    val tgtTot = tgt.valuesIterator.sum.toDouble + alpha * nBuckets
    val rawTot = rawC.valuesIterator.sum.toDouble + alpha * nBuckets
    require(tgtTot > alpha * nBuckets, "target corpus has no features")
    require(rawTot > alpha * nBuckets, "raw corpus has no features")
    val ratios = (tgt.keySet ++ rawC.keySet).iterator.map { b =>
      b -> (math.log((tgt.getOrElse(b, 0L) + alpha) / tgtTot) -
            math.log((rawC.getOrElse(b, 0L) + alpha) / rawTot))
    }.toMap
    RatioModel(ratios, math.log(alpha / tgtTot) - math.log(alpha / rawTot), hexChars)
  }

  /** Adds `n_features` (BIGINT) and `dsir_weight` (the text-order fold of
    * per-feature log ratios; 0.0 for an empty/NULL document). Row-local —
    * one scan, no shuffle. */
  def withImportanceWeight(df: DataFrame, textCol: String,
                           model: RatioModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val weight = udf { ts: Seq[String] =>
      val m = bc.value
      var s = 0.0
      var i = 0
      // unigrams in text order…
      while (i < ts.length) {
        s += m.ratios.getOrElse(bucketOf(ts(i), m.hexChars), m.default)
        i += 1
      }
      // …then bigrams in text order (matches [[features]])
      i = 0
      while (i < ts.length - 1) {
        s += m.ratios.getOrElse(bucketOf(ts(i) + " " + ts(i + 1), m.hexChars),
          m.default)
        i += 1
      }
      s
    }
    val t = coalesce(toks(col(textCol)), array())
    df.withColumn("n_features",
        when(size(t) > 0, size(t) * 2 - 1).otherwise(lit(0)).cast("long"))
      .withColumn("dsir_weight", weight(t))
  }

  /** Deterministic standard Gumbel draw keyed by the id column: the
    * uniform is `(v + 0.5) / 16^6` where `v` is the first 6 md5 hex
    * digits of the id string — exact integer arithmetic, reproducible
    * across engines and runs (the same derandomization family as
    * [[CorpusPipeline.deterministicSample]]). */
  def gumbel(id: Column): Column = {
    val v = conv(substring(md5(id.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("double")
    val u = (v + 0.5) / (1 << 24).toDouble
    -log(-log(u))
  }

  /** Gumbel-top-n importance resampling: fit on (raw, target), score raw,
    * keep the n documents with the largest `dsir_weight + Gumbel(id)`.
    * Output: `rank` (1-based BIGINT), the id column, `dsir_weight`. */
  def resample(raw: DataFrame, idCol: String, textCol: String,
               target: DataFrame, n: Int, hexChars: Int = 2,
               alpha: Double = 1.0): DataFrame = {
    val model = fitLogRatios(raw, target, textCol, hexChars, alpha)
    val scored = withImportanceWeight(raw, textCol, model)
      .withColumn("__gumbel_key", -(col("dsir_weight") + gumbel(col(idCol))))
    import org.apache.spark.sql.expressions.Window
    graft.operators.TopK.global(scored, "__gumbel_key", n, idCol)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__gumbel_key").asc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), col("dsir_weight"))
  }
}
