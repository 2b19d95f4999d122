package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis pipeline stage: enrich a document DataFrame with
  * token counts, quality features, heuristic language ID, and a content
  * fingerprint — the per-document feature pass a training-data pipeline
  * runs before filtering/dedup. Narrow (no shuffle): one codegen'd
  * projection over the corpus.
  */
object TextAnalysis {

  /** Adds: n_tokens, est_bpe_tokens, n_chars_calc, stopword_ratio,
    * punct_ratio, mean_token_len, quality, lang_guess, fingerprint. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("est_bpe_tokens", bpeTokenEstimate(t))
      .withColumn("n_chars_calc", length(t))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("mean_token_len", round(meanTokenLen(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_guess", langGuess(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
