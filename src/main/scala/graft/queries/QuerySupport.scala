package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared helpers for the driver-facing query inventory.
  *
  * Determinism rules (the driver hash-compares against a DuckDB oracle):
  *  - every query ends with a total ORDER BY (unique tie-break key);
  *  - float outputs are either raw column values (read identically by both
  *    engines from the same parquet) or explicitly rounded;
  *  - arithmetic that would be summation-order-sensitive (e.g. sum of
  *    arbitrary doubles) is avoided in oracle-checked outputs;
  *  - integer-ish outputs are BIGINT on both sides.
  */
object QuerySupport {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark only reads as a
    // raw long (nanos since epoch). All queries treat `ts` accordingly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Embedding dimension of the driver testdata `embeddings` table. */
  val Dim = 64

  /** Deterministic query vector: one-decimal values in [-0.6, 0.6], exactly
    * representable in both a Scala Double literal and a DuckDB DECIMAL→DOUBLE
    * literal, so both engines see bit-identical query vectors. */
  def qvec(seed: Int): Array[Double] =
    Array.tabulate(Dim)(i => (((i * 7 + seed * 13) % 13) - 6) / 10.0)

  def qvecF(seed: Int): Array[Float] = qvec(seed).map(_.toFloat)

  /** DuckDB literal for qvec, cast to DOUBLE[]. */
  def sqlVec(seed: Int): String =
    qvec(seed).mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** DuckDB expression for the embedding column widened to DOUBLE[] —
    * matches the Spark expressions' float→double widening. */
  val EmbD = "CAST(embedding AS DOUBLE[])"
}
