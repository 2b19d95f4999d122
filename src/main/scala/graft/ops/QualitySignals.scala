package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher/C4-style repetition and symbol signals — the per-document
  * quality features web-scale training pipelines filter on (Rae et al.
  * 2021 "Scaling Language Models" §A1.1 repetition rules; see
  * PAPERS.md). Complements [[TextAnalysis]] (length/stopword/language
  * features) with the *repetition* family: duplicate n-gram mass, token
  * diversity, most-frequent-token share, symbol-to-alnum ratio.
  *
  * Everything is a narrow codegen'd projection — no shuffle, no UDF —
  * and integer/double arithmetic with a fixed fold shape, so an
  * external SQL engine reproduces every value exactly (q_repetition's
  * oracle). The reference has no quality filtering at all (ingest is
  * verbatim, reference: src/langchain_memvid/encoder.py:54-88); these
  * are the operators a 100 TB corpus needs before it is worth
  * embedding.
  */
object QualitySignals {

  /** Raw word 2-grams — moved to the tokenization-contract surface
    * ([[TextFunctions.rawBigrams]]); this alias keeps existing callers
    * compiling. */
  def rawBigrams(toks: Column): Column = TextFunctions.rawBigrams(toks)

  /** Adds the repetition/symbol signal columns:
    *  - n_tokens
    *  - distinct_token_ratio: |distinct tokens| / n_tokens
    *  - top_token_frac: occurrences of the most frequent token / n_tokens
    *  - dup_bigram_frac: (bigrams - distinct bigrams) / bigrams
    *  - symbol_ratio: chars that are neither letters, digits, nor
    *    spaces — UNICODE letter/digit classes (\p{L}\p{N}), not ASCII:
    *    an ASCII-only class counts every accented or non-Latin letter
    *    as a "symbol", so the 0.1 gate would structurally drop all
    *    non-English text (including the de/es/fr documents langGuess
    *    exists to recognize)
    *  - gopher_keep: the composite keep/drop decision
    *
    * Ratios are rounded to 4 dp; the keep flag is computed from the
    * ROUNDED values so the decision is reproducible cross-engine.
    *
    * The token array is let1-bound: Catalyst's projection collapse
    * would otherwise re-split the text once per derived column. */
  def signals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sig = TextFunctions.let1(TextFunctions.tokens(t)) { toks =>
      val n = size(toks)
      val nD = greatest(n, lit(1)).cast("double")
      val distinctRatio = round(size(array_distinct(toks)).cast("double") / nD, 4)
      // Most-frequent-token share: O(distinct * n) per row — fine for
      // document-sized token lists, and stays narrow (no explode/agg).
      // NO coalesce-to-0: for non-null text the distinct array is never
      // empty (split always yields >= 1 token), so the only way this is
      // null is a NULL text — which must null the signal like every
      // other ("a null text nulls every signal" below); a 0.0 here made
      // undecodable docs look maximally diverse to any consumer reading
      // this column alone.
      val topTokenFrac = round(
        array_max(transform(array_distinct(toks),
          u => size(filter(toks, x => x === u)))).cast("double") / nD, 4)
      val dupBigramFrac = TextFunctions.let1(rawBigrams(toks)) { bg =>
        when(size(bg) === 0, lit(0.0)).otherwise(
          round((size(bg) - size(array_distinct(bg))).cast("double") /
            size(bg).cast("double"), 4))
      }
      struct(
        n.cast("long").as("n_tokens"),
        distinctRatio.as("distinct_token_ratio"),
        topTokenFrac.as("top_token_frac"),
        dupBigramFrac.as("dup_bigram_frac"))
    }
    // Unicode letter/digit classes, NOT [A-Za-z0-9]: both engines (Java
    // regex and DuckDB's RE2) agree on \p{L}/\p{N} general categories,
    // and the ASCII class counted every ä/é/ñ — and every non-Latin
    // letter — as a symbol, structurally failing non-English documents
    // at the 0.1 gate.
    val symbolRatio = round(
      (length(t) - length(regexp_replace(t, "[^\\p{L}\\p{N} ]", ""))).cast("double") /
        greatest(length(t), lit(1)).cast("double"), 4)
    // A NULL text must null EVERY signal (the stated contract): the
    // token split of null text is a null ARRAY, and size(null) is -1
    // here — without this guard n_tokens was a fabricated -1,
    // distinct_token_ratio -1.0, and dup_bigram_frac 0.0 (rawBigrams
    // maps the null array to array(), so the ===0 branch fired) —
    // undecodable docs silently skewed corpus means and read as
    // zero-duplication documents.
    def nullForNullText(c: Column): Column =
      when(t.isNull, lit(null)).otherwise(c)
    val out = df
      .withColumn("n_tokens", nullForNullText(sig.getField("n_tokens")))
      .withColumn("distinct_token_ratio",
        nullForNullText(sig.getField("distinct_token_ratio")))
      .withColumn("top_token_frac", nullForNullText(sig.getField("top_token_frac")))
      .withColumn("dup_bigram_frac", nullForNullText(sig.getField("dup_bigram_frac")))
      .withColumn("symbol_ratio", symbolRatio)
    // coalesce to FALSE: a null text nulls every signal, and a null
    // keep flag would put the doc in NEITHER the keep nor the drop set
    // (both where(keep) and where(!keep) exclude it). Undecodable text
    // is a drop, not a limbo row.
    out.withColumn("gopher_keep",
      coalesce(
        col("n_tokens").between(10L, 100000L) &&
          col("distinct_token_ratio") >= 0.3 &&
          col("top_token_frac") <= 0.2 &&
          col("dup_bigram_frac") <= 0.05 &&
          col("symbol_ratio") <= 0.1,
        lit(false)))
  }
}
