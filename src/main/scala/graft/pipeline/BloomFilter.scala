package graft.pipeline

import org.apache.spark.sql.Dataset

/** Serializable Bloom filter over strings with deterministic MD5-derived
  * double hashing (Kirsch & Mitzenmacher 2006: k positions from two
  * independent halves of one 128-bit digest — full Bloom accuracy at one
  * hash per element). Bit array sized by the standard optimum
  * m = -n·ln(p)/ln²2, k = (m/n)·ln2.
  *
  * Two properties the decontamination path leans on:
  *  - NO false negatives, ever — an element that was added always probes
  *    positive (the safety direction for eval-set filtering: a benchmark
  *    shingle can never slip through);
  *  - the filter is a PURE FUNCTION of (element set, numBits, numHashes)
  *    — builds are bit-identical across partitionings and reruns, because
  *    OR is commutative/associative and the hash is seeded by content
  *    only.
  *
  * Scale contract: the broadcast is m/8 bytes REGARDLESS of element
  * count or string lengths (~1.2 MB per 1M elements at p=1e-7), where
  * broadcasting the exact string set grows with total bytes; the
  * distributed build is one pass (per-partition local filters, bitwise-OR
  * tree reduce — the idiomatic Spark shape). */
final class BloomFilter private (val bits: Array[Long], val numHashes: Int)
    extends Serializable {

  def numBits: Long = bits.length.toLong * 64L

  private def setBit(pos: Long): Unit = {
    bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
  }

  private def getBit(pos: Long): Boolean =
    (bits((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L

  /** MD5 → (h1, h2) longs; thread-confined digest reuse. */
  private def hashPair(s: String): (Long, Long) = {
    val d = BloomFilter.digests.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (h(i) & 0xffL); h2 = (h2 << 8) | (h(i + 8) & 0xffL); i += 1 }
    (h1, h2)
  }

  def add(s: String): Unit = {
    val (h1, h2) = hashPair(s)
    val m = numBits
    var i = 0
    while (i < numHashes) {
      // Long.MinValue-safe non-negative combined hash
      setBit(((h1 + i.toLong * h2) & Long.MaxValue) % m)
      i += 1
    }
  }

  def mightContain(s: String): Boolean = {
    val (h1, h2) = hashPair(s)
    val m = numBits
    var i = 0
    while (i < numHashes) {
      if (!getBit(((h1 + i.toLong * h2) & Long.MaxValue) % m)) return false
      i += 1
    }
    true
  }

  /** In-place bitwise OR merge (same geometry required). */
  def orWith(other: BloomFilter): BloomFilter = {
    require(other.bits.length == bits.length && other.numHashes == numHashes,
      "bloom geometry mismatch")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }
}

object BloomFilter {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Optimal geometry for `expectedN` elements at false-positive rate
    * `fpp`; numBits rounds up to a multiple of 64. */
  def empty(expectedN: Long, fpp: Double): BloomFilter = {
    require(expectedN > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing ($expectedN, $fpp)")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-expectedN.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val words = math.max(1L, (mRaw + 63L) / 64L)
    require(words <= Int.MaxValue / 8, s"bloom of $mRaw bits exceeds array bounds")
    val k = math.max(1, math.round((words * 64.0 / expectedN) * ln2).toInt)
    new BloomFilter(new Array[Long](words.toInt), k)
  }

  /** Distributed build: per-partition local filters, bitwise-OR tree
    * reduce. One pass over the elements; the driver receives
    * ceil(log₂ partitions) merged bit arrays, never the elements. */
  def build(elems: Dataset[String], expectedN: Long, fpp: Double): BloomFilter = {
    val n = math.max(1L, expectedN)
    val rdd = elems.rdd
    if (rdd.partitions.isEmpty) return empty(n, fpp) // driver-side, no job
    val partial = rdd.mapPartitions { it =>
      val bf = empty(n, fpp)
      it.foreach(bf.add)
      Iterator(bf)
    }
    partial.treeReduce((a, b) => a.orWith(b))
  }
}
