package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable linear quality classifier over hashed word n-gram features —
  * the fastText-supervised / CCNet-linear-filter shape used to score
  * "looks like curated text" vs "looks like raw crawl" in production
  * training-data pipelines (Joulin et al. 2016 "Bag of Tricks for
  * Efficient Text Classification"; CCNet, Wenzek et al. 2020).
  *
  * Features: word uni+bi-grams (lowercased `[a-z0-9]+` runs, the corpus
  * alphabet shared with [[BpeTokenizer]]/[[TextAnalysis]]) hashed into
  * `hashDim` buckets (MurmurHash3 — the fastText trick: no vocabulary to
  * build, ship, or grow), L1-normalized per document so score magnitude
  * is length-invariant.
  *
  * Training: full-batch logistic regression by gradient descent. Each
  * iteration is ONE `treeAggregate` pass over the (optionally sampled)
  * corpus — per-partition gradient partial sums in double precision,
  * tree-combined; the driver holds only the `hashDim`-sized weight
  * vector. No shuffle of the corpus anywhere; at 100 TB you train on a
  * hash-sampled slice (`sampleFraction`) exactly like the reference
  * pipelines do, and score the full corpus row-locally with the
  * broadcast model.
  *
  * Determinism: zero init + full-batch gradients means the model is a
  * pure function of the (data, hyperparameter) pair up to float
  * summation order across partitions; double accumulators keep the
  * cross-partitioning drift at the last-ulp level (asserted in
  * QualityClassifierSpec).
  */
object QualityClassifier {

  private val TokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

  final case class Model(weights: Array[Double], bias: Double,
                         hashDim: Int,
                         hashFamily: String = "murmur") extends Serializable {
    def score(text: String): Double = {
      if (text == null) return sigmoid(bias)
      val (idx, v) = featurize(text, hashDim, hashFamily)
      var z = bias
      var i = 0
      while (i < idx.length) { z += weights(idx(i)) * v(i); i += 1 }
      sigmoid(z)
    }
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  // MessageDigest is stateful and not thread-safe; executors re-initialize
  // per thread (same pattern as Dsir/BloomFilter)
  private val mdTl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** The SQL-replayable feature bucket: first 15 hex chars of the md5 of
    * the gram, as an unsigned long, mod `hashDim` — byte-for-byte the
    * oracle idiom `CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) %
    * dim` (same family as the dedup_*_md5 strict siblings; murmur stays
    * the throughput default). */
  private[pipeline] def md5Bucket(s: String, hashDim: Int): Int = {
    val d = mdTl.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new StringBuilder(15)
    var i = 0
    while (hex.length < 15) {
      hex.append(f"${h(i) & 0xff}%02x")
      i += 1
    }
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % hashDim).toInt
  }

  /** Hashed uni+bi-gram L1-normalized sparse vector: (indices, values),
    * indices strictly increasing (merged duplicates). */
  private[pipeline] def featurize(text: String, hashDim: Int,
                                  family: String = "murmur"): (Array[Int], Array[Double]) = {
    val m = TokenPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val toks = Array.newBuilder[String]
    while (m.find()) toks += m.group()
    val t = toks.result()
    if (t.isEmpty) return (Array.empty, Array.empty)
    val counts = new java.util.HashMap[Int, Double]()
    var total = 0.0
    val bucket: String => Int =
      if (family == "md5") md5Bucket(_, hashDim)
      else s => math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c), hashDim)
    def add(s: String): Unit = {
      val h = bucket(s)
      counts.merge(h, 1.0, _ + _)
      total += 1.0
    }
    var i = 0
    while (i < t.length) {
      add(t(i))
      if (i + 1 < t.length) add(t(i) + " " + t(i + 1))
      i += 1
    }
    val idx = new Array[Int](counts.size)
    val it = counts.keySet().iterator()
    var j = 0
    while (it.hasNext) { idx(j) = it.next(); j += 1 }
    java.util.Arrays.sort(idx)
    val v = new Array[Double](idx.length)
    j = 0
    while (j < idx.length) { v(j) = counts.get(idx(j)) / total; j += 1 }
    (idx, v)
  }

  /** Train on (textCol, labelCol ∈ {0,1}). One treeAggregate per
    * iteration; `sampleFraction < 1` trains on a deterministic
    * (seed-hashed) sample while the model still scores everything. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            hashDim: Int = 1 << 18, iters: Int = 50, lr: Double = 2.0,
            l2: Double = 1e-6, sampleFraction: Double = 1.0,
            seed: Long = 42L): Model = {
    require(hashDim > 0 && iters > 0 && lr > 0, "bad hyperparameters")
    val spark = df.sparkSession
    val base = df.select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
    val trainDf =
      if (sampleFraction >= 1.0) base
      else base.sample(withReplacement = false, sampleFraction, seed)
    // featurize ONCE, keep the sparse vectors for every GD pass
    val feats = trainDf.rdd.map { r =>
      val (idx, v) = featurize(r.getString(0), hashDim)
      (idx, v, r.getDouble(1))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count()
    require(n > 0, "no labeled rows to train on")

    var w = new Array[Double](hashDim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w)
      val bb = b
      // gradient of mean log-loss; sparse accumulation per partition
      val (gw, gb) = feats.treeAggregate((new Array[Double](hashDim), 0.0))(
        seqOp = { case ((gwAcc, gbAcc), (idx, v, y)) =>
          var z = bb
          var i = 0
          while (i < idx.length) { z += bw.value(idx(i)) * v(i); i += 1 }
          val err = sigmoid(z) - y
          i = 0
          while (i < idx.length) { gwAcc(idx(i)) += err * v(i); i += 1 }
          (gwAcc, gbAcc + err)
        },
        combOp = { case ((a, ab), (c, cb)) =>
          var i = 0
          while (i < hashDim) { a(i) += c(i); i += 1 }
          (a, ab + cb)
        })
      bw.destroy()
      val wNew = new Array[Double](hashDim)
      var i = 0
      while (i < hashDim) { wNew(i) = w(i) - lr * (gw(i) / n + l2 * w(i)); i += 1 }
      w = wNew
      b -= lr * (gb / n)
      it += 1
    }
    feats.unpersist()
    Model(w, b, hashDim)
  }

  /** A deterministic PINNED model for oracle replay: md5 feature buckets
    * and formulaic weights `w(h) = ((h mod 17) - 8) / 10`, bias 0.1 —
    * every number is SQL arithmetic, so the full scoring path (tokenize →
    * uni+bi-gram → bucket → L1-normalize → ascending-bucket dot product →
    * sigmoid) replays bit-for-bit in the DuckDB oracle
    * (`quality_score_md5`). The TRAINED murmur path stays the production
    * shape; this pins the scorer's arithmetic, the exact-sibling pattern
    * of dedup_minhash_md5. */
  def pinnedMd5Model(hashDim: Int = 64): Model = {
    val w = Array.tabulate(hashDim)(h => ((h % 17) - 8) / 10.0)
    Model(w, 0.1, hashDim, hashFamily = "md5")
  }

  /** Row-local scoring against the broadcast model: P(label=1 | text). */
  def scoreCol(df: DataFrame, textCol: String, model: Model): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val f = udf((text: String) => bc.value.score(text))
    f(col(textCol))
  }

  def withQualityScore(df: DataFrame, textCol: String, model: Model,
                       outCol: String = "quality_prob"): DataFrame =
    df.withColumn(outCol, scoreCol(df, textCol, model))
}
