package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the temporal join operators (AsofJoin / RangeJoin):
  * measures both at n and 10n rows per side (constant per-key event
  * density — the time range grows with n, interval widths stay fixed,
  * like a real log) and appends growth tables to SCALE.md. A warmup pass
  * runs first so the small decade doesn't absorb JIT/codegen cost.
  *
  * Also measures the NAIVE plan each operator replaces at n/10 and
  * ~n/10*sqrt(10) (two points are enough to show the exponent — the
  * per-key pair term |L_k|x|R_k| is quadratic in rows, so the naive
  * arm grows ~10x where the operators grow ~3x):
  *
  *   - as-of naive: key-equi join + ts filter + per-left-row rank —
  *     materializes every (left, predecessor) pair before picking one.
  *   - range naive: key-equi join + BETWEEN filter over ALL intervals
  *     of the key.
  *
  * Usage: runMain graft.tools.RelJoinScale [n] [nKeys]
  * (defaults n=1,000,000, nKeys=200 — few enough keys that the pair
  * term actually bites, mirroring a low-cardinality entity id.)
  */
object RelJoinScale {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nBig = args.headOption.map(_.toInt).getOrElse(1000000)
    val nKeys = if (args.length > 1) args(1).toInt else 200

    def timeIt(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // constant density: mean same-key gap = (100n / (n/nKeys)) = 100*nKeys
    // ts units at EVERY n; interval width = 20x that mean gap, fixed.
    val width = 2000L * nKeys
    def mkSide(n: Int, salt: Int): DataFrame =
      spark.range(n).repartition(32).select(
        col("id"),
        pmod(hash(col("id") + salt), lit(nKeys)).cast("long").as("k"),
        pmod(hash(col("id") * 31 + salt + 7), lit(100L * n)).cast("long").as("ts"))

    def sides(n: Int): (DataFrame, DataFrame, DataFrame) = {
      val left = mkSide(n, 1).withColumnRenamed("ts", "lts")
        .withColumnRenamed("id", "lid").cache()
      val right = mkSide(n, 2).withColumnRenamed("ts", "rts")
        .withColumnRenamed("id", "rid").cache()
      // intervals: every 10th right row opened for `width`
      val iv = right.filter(col("rid") % 10 === 0)
        .select(col("rid"), col("k"), col("rts").as("s"),
          (col("rts") + width).as("e")).cache()
      left.count(); right.count(); iv.count()
      (left, right, iv)
    }
    def opAsof(l: DataFrame, r: DataFrame): Long =
      graft.operators.AsofJoin.join(l, r, Seq("k"), "lts", "rts",
        rightTieBreak = Some("rid")).count()
    def opRange(l: DataFrame, iv: DataFrame): Long =
      graft.operators.RangeJoin.pointInInterval(
        l, "lts", iv, "s", "e", Seq("k"), width).count()

    // warmup: full code path at the small size, untimed
    locally {
      val (l, r, iv) = sides(nBig / 10)
      opAsof(l, r); opRange(l, iv)
      l.unpersist(); r.unpersist(); iv.unpersist()
    }

    final case class P(n: Int, asof: Double, asofRows: Long,
                       range: Double, rangeRows: Long)
    val pts = Seq(nBig / 10, nBig).map { n =>
      val (l, r, iv) = sides(n)
      val (tA, rA) = timeIt(opAsof(l, r))
      val (tR, rR) = timeIt(opRange(l, iv))
      println(f"[reljoin-scale] n=$n%,d asof=$tA%.2f s ($rA%,d rows) " +
        f"range=$tR%.2f s ($rR%,d rows)")
      l.unpersist(); r.unpersist(); iv.unpersist()
      P(n, tA, rA, tR, rR)
    }

    // naive as-of arm at two sizes: growth exponent, not just one ratio
    final case class N(n: Int, asof: Double)
    val naive = Seq(nBig / 10, (nBig / 10 * math.sqrt(10)).toInt).map { n =>
      val (l, r, iv) = sides(n)
      val (tA, _) = timeIt {
        import org.apache.spark.sql.expressions.Window
        val pairs = l.join(r, Seq("k")).filter(col("rts") <= col("lts"))
        val w = Window.partitionBy("lid").orderBy(col("rts").desc, col("rid").desc)
        pairs.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).count()
      }
      println(f"[reljoin-scale] naive@n=$n%,d asof_pairs=$tA%.2f s")
      l.unpersist(); r.unpersist(); iv.unpersist()
      N(n, tA)
    }

    // KEYLESS range: without an equality key Spark has no hash join to
    // fall back on — a bare BETWEEN plans as BroadcastNestedLoopJoin,
    // |P| x |I| comparisons at ANY output size. Points are fixed at nBig;
    // the interval count is sqrt(10)-spaced so the comparison product
    // crosses the tens-of-billions range where the law is visible
    // (codegen grinds ~1e9 cheap comparisons/s — below that the nested
    // loop hides in fixed costs). Interval width = 10x the mean point
    // gap, so output stays ~10 rows/interval at every size.
    final case class K(nIv: Int, op: Double, naiveT: Double, rows: Long)
    val kWidth = 1000L // mean point gap is 100 ts units at every n
    val keyless = Seq(nBig / 100, (nBig / 100 * math.sqrt(10)).toInt).map { nIv =>
      val p = mkSide(nBig, 5).drop("k").withColumnRenamed("ts", "lts")
        .withColumnRenamed("id", "lid").cache()
      val iv = mkSide(nIv, 6).drop("k")
        .select(col("id").as("iid"),
          expr(s"ts * ${nBig / nIv}").cast("long").as("s"))
        .withColumn("e", col("s") + kWidth).cache()
      p.count(); iv.count()
      val (tOp, rows) = timeIt {
        graft.operators.RangeJoin.pointInInterval(
          p, "lts", iv, "s", "e", Nil, kWidth).count()
      }
      val (tN, _) = timeIt {
        p.join(iv, col("lts") >= col("s") && col("lts") <= col("e")).count()
      }
      println(f"[reljoin-scale] keyless@points=$nBig%,d iv=$nIv%,d op=$tOp%.2f s " +
        f"nestedloop=$tN%.2f s ($rows%,d rows)")
      p.unpersist(); iv.unpersist()
      K(nIv, tOp, tN, rows)
    }

    val scaleMd = java.nio.file.Paths.get("SCALE.md")
    if (java.nio.file.Files.exists(scaleMd)) {
      val sb = new StringBuilder
      sb.append("\n## Temporal joins at 10x data (graft.tools.RelJoinScale)\n\n")
      sb.append(f"$nKeys%,d keys (low-cardinality on purpose — the naive\n")
      sb.append("key-equi-join pair term |L_k|x|R_k| is what the operators\n")
      sb.append("avoid); constant per-key event density (time range grows\n")
      sb.append("with n, interval width fixed at 20x the mean same-key gap;\n")
      sb.append("intervals = 10% of right rows). Warm JVM.\n\n")
      sb.append("| n per side | asof (union-window) | asof rows | range (bucketed) | range rows |\n|---|---|---|---|---|\n")
      pts.foreach(p => sb.append(
        f"| ${p.n}%,d | ${p.asof}%.2f s | ${p.asofRows}%,d | ${p.range}%.2f s | ${p.rangeRows}%,d |\n"))
      val g = pts.last; val s = pts.head
      sb.append(f"\nGrowth at 10x data: asof ${g.asof / s.asof}%.1fx, range ${g.range / s.range}%.1fx —\n")
      sb.append("both ride the one hash exchange + linear window/filter scan.\n")
      sb.append("\nNaive as-of (key-equi join + per-left-row argmax — what Spark\n")
      sb.append("does without the operator), at sqrt(10)-spaced sizes so two\n")
      sb.append("points give the exponent:\n\n")
      sb.append("| n per side | join-then-argmax asof |\n|---|---|\n")
      naive.foreach(x => sb.append(f"| ${x.n}%,d | ${x.asof}%.2f s |\n"))
      val nG = naive.last; val nS = naive.head
      sb.append(f"\nGrowth at 3.2x data: ${nG.asof / nS.asof}%.1fx (the |L_k|x|R_k| pair term\n")
      sb.append(f"is quadratic: ~10x per sqrt(10) of rows) vs the union-window\n")
      sb.append(f"plan's linear law above; at n=${s.n}%,d the naive plan already\n")
      sb.append(f"costs ${nS.asof / s.asof}%.1fx the operator, and the ratio doubles per sqrt(10).\n")
      sb.append("(A KEYED naive range join is not shown: with an equality key\n")
      sb.append("Spark still gets a hash join and the BETWEEN filter is cheap\n")
      sb.append("at these pair volumes — the keyed operator's value is the\n")
      sb.append("bucket co-location at much larger per-key density and skew.)\n")
      sb.append("\nKEYLESS range join — no equality key means Spark's only plan\n")
      sb.append("is BroadcastNestedLoopJoin: |P| x |I| comparisons at ANY\n")
      sb.append("output size. The bucketed operator keeps an equi-join on the\n")
      sb.append(f"time bucket alone. Points fixed at $nBig%,d, interval count\n")
      sb.append("sqrt(10)-spaced, output held at ~10 rows/interval:\n\n")
      sb.append("| intervals | comparisons | bucketed op | nested loop | out rows |\n|---|---|---|---|---|\n")
      keyless.foreach(x => sb.append(
        f"| ${x.nIv}%,d | ${x.nIv.toLong * nBig / 1000000000L}%,d G | ${x.op}%.2f s | ${x.naiveT}%.2f s | ${x.rows}%,d |\n"))
      val kG = keyless.last; val kS = keyless.head
      sb.append(f"\nAt ${kG.nIv}%,d intervals the nested loop costs ${kG.naiveT / kG.op}%.1fx the\n")
      sb.append(f"bucketed plan and grew ${kG.naiveT / kS.naiveT}%.1fx for 3.2x intervals (bucketed:\n")
      sb.append(f"${kG.op / kS.op}%.1fx) — the nested loop rides the comparison PRODUCT while\n")
      sb.append("the bucketed join rides output+scan; every further decade of\n")
      sb.append("either side multiplies the gap by 10.\n")
      java.nio.file.Files.writeString(scaleMd, sb.toString,
        java.nio.file.StandardOpenOption.APPEND)
      println("[reljoin-scale] appended to SCALE.md")
    }
    spark.stop()
  }
}
