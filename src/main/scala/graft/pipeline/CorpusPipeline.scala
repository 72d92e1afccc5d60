package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call corpus cleaning for training-data pipelines: exact dedup →
  * language ID → quality scoring → policy filters, composed from the
  * individual operators so the whole pass stays declarative (Catalyst sees
  * one plan: the dedup semi-join, then row-local codegen'd scoring, then
  * pushed-down filters — no materialization between stages).
  *
  * 100 TB posture: dedup is a hash-aggregate semi-join (map-side partials);
  * everything after it is row-local, so the pipeline's only shuffle is the
  * dedup grouping. Filters sit directly above the scan after optimization.
  */
object CorpusPipeline {

  /** Cleaned relation: exact duplicates dropped (first id wins), then rows
    * must pass `quality_score >= minQuality`, language membership (empty set
    * = keep all), and `length >= minChars`. Adds `lang_pred` and
    * `quality_score` columns. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.0, langs: Set[String] = Set.empty,
            minChars: Int = 0): DataFrame = {
    val deduped = Dedup.dropExactDuplicates(df, idCol, textCol)
    val scored = TextAnalysis.withQualityScore(
      TextAnalysis.withLangId(deduped, textCol), textCol)
    val filters = Seq[Option[Column]](
      if (minQuality > 0) Some(col("quality_score") >= minQuality) else None,
      if (langs.nonEmpty) Some(col("lang_pred").isin(langs.toSeq: _*)) else None,
      if (minChars > 0) Some(length(col(textCol)) >= minChars) else None
    ).flatten
    filters.foldLeft(scored)(_ filter _)
  }

  /** Per-reason attrition report for a cleaning run: how many rows each
    * stage would drop (stages evaluated independently over the deduped
    * set, the way corpus-cleaning audits report them). One aggregation
    * pass — counts are conditional sums, not separate jobs. */
  def attritionReport(df: DataFrame, idCol: String, textCol: String,
                      minQuality: Double, langs: Set[String],
                      minChars: Int): DataFrame = {
    val total = count(lit(1))
    val scored = TextAnalysis.withQualityScore(
      TextAnalysis.withLangId(Dedup.dropExactDuplicates(df, idCol, textCol),
        textCol), textCol)
    // empty langs = keep-all (mirrors clean()): zero-arg isin is always
    // false, so not(isin()) would count EVERY row as wrong-language
    val wrongLang =
      if (langs.isEmpty) lit(0L)
      else sum(when(not(col("lang_pred").isin(langs.toSeq: _*)), 1L).otherwise(0L))
    scored.agg(
      total.as("n_after_dedup"),
      sum(when(col("quality_score") < minQuality, 1L).otherwise(0L)).as("n_low_quality"),
      wrongLang.as("n_wrong_lang"),
      sum(when(length(col(textCol)) < minChars, 1L).otherwise(0L)).as("n_too_short"))
  }
}
