package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // Older generator runs wrote events.ts as TIMESTAMP(NANOS), which Spark
    // only reads as a raw long (nanos since epoch); newer runs write
    // timestamp[us] (read as TIMESTAMP_NTZ). Keep the legacy conf on and
    // normalize via [[tsMicros]] so queries work against either vintage.
    // (This read conf is the only session conf set here — [[tsMicros]] is
    // timezone-independent, so no session timeZone pin is needed.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` as epoch-MICROSECONDS (BIGINT), whatever physical type the
    * generator wrote: raw int64 nanos (legacy `nanosAsLong` read) → integer
    * div; TIMESTAMP_NTZ → wall-clock micros since the NTZ epoch literal
    * (session-timezone-INDEPENDENT, exactly DuckDB's tz-free `epoch_us` on a
    * naive timestamp); TIMESTAMP → `unix_micros` (instant-based, tz-free by
    * definition). Matches DuckDB `epoch_us(ts)` on every vintage without
    * touching the session timezone. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000")
    case TimestampNTZType =>
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    case _                => unix_micros(col("ts"))
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
