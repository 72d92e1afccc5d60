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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ→TIMESTAMP casts below must be wall-clock-preserving for both
    // engines: pin UTC (DuckDB's epoch_us on a naive timestamp is tz-free).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` as epoch-MICROSECONDS (BIGINT), whatever physical type the
    * generator wrote: raw int64 nanos (legacy `nanosAsLong` read) → integer
    * div; timestamp[us] (TIMESTAMP or TIMESTAMP_NTZ) → `unix_micros` under
    * the UTC session zone pinned in [[table]]. Matches DuckDB `epoch_us(ts)`
    * exactly on either vintage. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000")
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
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
