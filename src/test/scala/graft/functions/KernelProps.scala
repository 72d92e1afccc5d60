package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based contracts for the JVM kernels (no Spark session — these
  * are the primitive-array loops the codegen'd expressions mirror).
  * Complements the example-based specs with the algebraic laws the search
  * and dedup layers silently rely on. */
object KernelProps extends Properties("graft.kernels") {

  private val vecN: Gen[Array[Float]] = for {
    n <- Gen.chooseNum(1, 96)
    xs <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield xs.toArray

  private val pairN: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 96)
    a <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    b <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield (a.toArray, b.toArray)

  private val tripleN: Gen[(Array[Float], Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 96)
    a <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    b <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    c <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield (a.toArray, b.toArray, c.toArray)

  property("l2Sq is symmetric, non-negative, zero on itself") =
    forAll(pairN) { case (a, b) =>
      val d = VectorKernels.l2Sq(a, b)
      d == VectorKernels.l2Sq(b, a) && d >= 0.0 && VectorKernels.l2Sq(a, a) == 0.0
    }

  property("dot is symmetric and bilinear in scaling") =
    forAll(pairN, Gen.chooseNum(-4f, 4f)) { case ((a, b), s) =>
      val d = VectorKernels.dot(a, b)
      val scaled = VectorKernels.dot(a.map(_ * s), b)
      // error budget scales with the UNCANCELLED magnitude sum — the
      // float32 per-element scaling rounds relative to |a_i·s·b_i|, not
      // to the (possibly tiny) cancelled result
      val absSum = a.indices.map(i => math.abs(a(i).toDouble * b(i))).sum
      d == VectorKernels.dot(b, a) &&
        math.abs(scaled - s.toDouble * d) <= 1e-6 * (1.0 + math.abs(s.toDouble) * absSum)
    }

  property("fp16 round-trip within half-precision error") =
    forAll(vecN) { v =>
      val rt = Fp16.decode(Fp16.encode(v))
      rt.length == v.length && v.indices.forall { i =>
        math.abs(rt(i) - v(i)) <= math.max(math.abs(v(i)) / 1024.0, 6.2e-5)
      }
    }

  property("fp16 encode is idempotent through a round-trip") =
    forAll(vecN) { v =>
      val once = Fp16.decode(Fp16.encode(v))
      Fp16.decode(Fp16.encode(once)).sameElements(once)
    }

  property("bq hamming: identity, symmetry, triangle inequality, naive agreement") =
    forAll(tripleN) { case (a, b, c) =>
      val (ca, cb, cc) = (Bq.encode(a), Bq.encode(b), Bq.encode(c))
      val naive = a.indices.count(i => (a(i) > 0f) != (b(i) > 0f))
      Bq.hamming(ca, ca) == 0 &&
        Bq.hamming(ca, cb) == Bq.hamming(cb, ca) &&
        Bq.hamming(ca, cb) == naive &&
        Bq.hamming(ca, cc) <= Bq.hamming(ca, cb) + Bq.hamming(cb, cc)
    }

  property("bq decode is unit-norm and re-encodes to the same bits") =
    forAll(vecN) { v =>
      val codes = Bq.encode(v)
      val d = Bq.decode(codes, v.length)
      math.abs(VectorKernels.dot(d, d) - 1.0) < 1e-5 &&
        Bq.encode(d).sameElements(codes)
    }

  property("random projection is deterministic and linear") =
    forAll(pairN) { case (a, b) =>
      val dim = a.length
      val mat = Projection.gaussianMatrix(dim, 8, seed = 7L)
      val pa = Projection.project(a, mat, 8)
      val again = Projection.project(a, mat, 8)
      val sum = Projection.project(a.indices.map(i => a(i) + b(i)).toArray, mat, 8)
      val pb = Projection.project(b, mat, 8)
      pa.sameElements(again) && pa.indices.forall { j =>
        math.abs(sum(j) - (pa(j) + pb(j))) <= 1e-2
      }
    }

  property("cosineDistanceEstimate stays on the [0,2] cosine-distance scale") =
    forAll(Gen.chooseNum(1, 512)) { dim =>
      (0 to dim).forall { h =>
        val d = Bq.cosineDistanceEstimate(h, dim)
        d >= 0.0 && d <= 2.0 + 1e-12
      }
    }
}
