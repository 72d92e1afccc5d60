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
    requireFitArgs(hexChars, alpha)
    val tgt = bucketCounts(target, textCol, hexChars)
    val rawC = bucketCounts(raw, textCol, hexChars)
    ratioModel(rawC, tgt, hexChars, alpha)
  }

  /** Single-pass fit for the common "target is a slice of the raw corpus"
    * shape (r18 optimization): one feature explode over `raw` counts every
    * bucket twice — raw unconditionally, target where `isTarget` holds —
    * so the corpus is scanned (and every feature md5-hashed) ONCE instead
    * of once for raw plus once more for the target slice. Counts are
    * exactly what the two-pass form produces when
    * `target == raw.filter(isTarget)`. */
  def fitLogRatios(raw: DataFrame, isTarget: Column, textCol: String,
                   hexChars: Int, alpha: Double): RatioModel = {
    requireFitArgs(hexChars, alpha)
    val rows = raw
      .select(isTarget.as("__t"), explode(features(col(textCol))).as("f"))
      .select(col("__t"), bucket(col("f"), hexChars).as("b"))
      .groupBy("b").agg(
        count(lit(1)).as("rc"),
        count(when(col("__t"), 1)).as("tc"))
      .collect()
    val rawC = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val tgt = rows.iterator.map(r => r.getString(0) -> r.getLong(2))
      .filter(_._2 > 0L).toMap
    ratioModel(rawC, tgt, hexChars, alpha)
  }

  private def requireFitArgs(hexChars: Int, alpha: Double): Unit = {
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars=$hexChars out of range [1,4] (bucket table must stay driver-resident)")
    require(alpha > 0.0, "alpha must be positive (unsmoothed ratios are unbounded)")
  }

  private def ratioModel(rawC: Map[String, Long], tgt: Map[String, Long],
                         hexChars: Int, alpha: Double): RatioModel = {
    val nBuckets = 1L << (4 * hexChars)
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
    * one scan, no shuffle.
    *
    * r18 optimization of the per-feature work (same values): the bucket
    * is the first `hexChars` md5 nibbles, so the ratio table flattens to
    * a dense double[16^hexChars] indexed straight off the digest bytes —
    * no hex-string allocation, no hash-map probe per feature — and
    * bigram digests stream the two token byte arrays through the digest
    * (UTF-8 of a concatenation is the concatenation of UTF-8), so no
    * bigram string or its bytes are ever materialized. */
  def withImportanceWeight(df: DataFrame, textCol: String,
                           model: RatioModel): DataFrame = {
    val n = 1 << (4 * model.hexChars)
    val flat = new Array[Double](n)
    java.util.Arrays.fill(flat, model.default)
    model.ratios.foreach { case (hex, v) =>
      flat(Integer.parseInt(hex, 16)) = v
    }
    val bc = df.sparkSession.sparkContext.broadcast(flat)
    val hexChars = model.hexChars
    val weight = udf { ts: Seq[String] =>
      val a = bc.value
      val md = mdTl.get()
      val nToks = ts.length
      // token bytes computed once, shared by the unigram and both bigram
      // digests that touch each token
      val bytes = new Array[Array[Byte]](nToks)
      var i = 0
      while (i < nToks) { bytes(i) = ts(i).getBytes("UTF-8"); i += 1 }
      def idxOfDigest(d: Array[Byte]): Int = {
        var idx = 0
        var nib = 0
        while (nib < hexChars) {
          val b = d(nib >> 1) & 0xff
          idx = (idx << 4) | (if ((nib & 1) == 0) b >> 4 else b & 0xf)
          nib += 1
        }
        idx
      }
      var s = 0.0
      // unigrams in text order…
      i = 0
      while (i < nToks) {
        md.reset()
        s += a(idxOfDigest(md.digest(bytes(i))))
        i += 1
      }
      // …then bigrams in text order (matches [[features]])
      i = 0
      while (i < nToks - 1) {
        md.reset()
        md.update(bytes(i))
        md.update(' '.toByte)
        md.update(bytes(i + 1))
        s += a(idxOfDigest(md.digest()))
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
               alpha: Double = 1.0): DataFrame =
    resampleWith(raw, idCol, textCol,
      fitLogRatios(raw, target, textCol, hexChars, alpha), n)

  /** [[resample]] with the single-pass slice fit (target =
    * `raw.filter(isTarget)`) — see the `fitLogRatios` Column overload. */
  def resample(raw: DataFrame, idCol: String, textCol: String,
               isTarget: Column, n: Int, hexChars: Int,
               alpha: Double): DataFrame =
    resampleWith(raw, idCol, textCol,
      fitLogRatios(raw, isTarget, textCol, hexChars, alpha), n)

  private def resampleWith(raw: DataFrame, idCol: String, textCol: String,
                           model: RatioModel, n: Int): DataFrame = {
    val scored = withImportanceWeight(raw, textCol, model)
      .withColumn("__gumbel_key", -(col("dsir_weight") + gumbel(col(idCol))))
    import org.apache.spark.sql.expressions.Window
    graft.operators.TopK.global(scored, "__gumbel_key", n, idCol)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__gumbel_key").asc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), col("dsir_weight"))
  }
}
