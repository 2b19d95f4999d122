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
    * punct_ratio, mean_token_len, quality, lang_guess, fingerprint.
    *
    * All token-derived columns read ONE fused stats pass
    * ([[graft.functions.TextStatsExpr]], let1-bound — the previous
    * shared-token-array discipline still re-ran ~9 interpreted HOF
    * folds over that array per row; HOF lambdas never enter codegen).
    * The ratios/scores/fold are the same Column arithmetic as the
    * `...Of` HOF twins applied to the kernel's exact integer counts —
    * bit-identical values (kernel counts parity-pinned; the
    * q_text_analysis oracle replays the HOF arithmetic externally). */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sig = let1(textStats(t)) { st =>
      val nD = greatest(st.getField("n_tokens"), lit(1L)).cast("double")
      val swEn = hitRatio(st, 1)
      val mtl = st.getField("sum_token_chars").cast("double") / nD
      struct(
        // size(toks) was INT; the kernel counts in long — cast back so
        // the published schema is unchanged
        st.getField("n_tokens").cast("int").as("n_tokens"),
        st.getField("bpe_est").as("est_bpe_tokens"),
        round(swEn, 4).as("stopword_ratio"),
        round(mtl, 4).as("mean_token_len"),
        qualityFormula(t, swEn, mtl).as("quality"),
        langFold(Seq("en" -> swEn, "de" -> hitRatio(st, 2),
          "es" -> hitRatio(st, 3), "fr" -> hitRatio(st, 4))).as("lang_guess"))
    }
    // Materialize the struct as a real aliased column and project the
    // six fields from the attribute: a copy of the full let1(textStats)
    // tree per withColumn relies on whole-stage-codegen subexpression
    // elimination, and under interpreted/codegen-disabled regimes the
    // fused kernel evaluated once per derived column. CollapseProject
    // will not inline a non-cheap alias referenced more than once, so
    // this is one kernel pass under every regime.
    val sigCol = "__graft_text_sig"
    // same guard class as ngramCharSignals' __rep_sig: withColumn would
    // silently REPLACE a user column of this name, and the drop below
    // would then destroy it.
    require(!graft.Cols.has(df, sigCol),
      s"analyze: the input already has a column named $sigCol " +
        "(session resolver); rename it first")
    val sc = col(sigCol)
    // The n_tokens wrapper is a belt-and-braces contract pin: the fused
    // kernel is null-in/null-out (null text -> null stats struct ->
    // null fields), so the when() is already a no-op — it stays so the
    // published "null text nulls n_tokens" behavior never silently
    // depends on the kernel's internals.
    df.withColumn(sigCol, sig)
      .withColumn("n_tokens",
        when(t.isNull, lit(null)).otherwise(sc.getField("n_tokens")))
      .withColumn("est_bpe_tokens", sc.getField("est_bpe_tokens"))
      .withColumn("n_chars_calc", length(t))
      .withColumn("stopword_ratio", sc.getField("stopword_ratio"))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("mean_token_len", sc.getField("mean_token_len"))
      .withColumn("quality", sc.getField("quality"))
      .withColumn("lang_guess", sc.getField("lang_guess"))
      .withColumn("fingerprint", fingerprint(t))
      .drop(sigCol)
  }

  /** The whole [[analyze]] feature row as ONE struct column over ONE
    * fused stats pass — the SQL surface (`graft_text_analysis`). A SQL
    * caller selecting several à-la-carte functions
    * (graft_quality_score + graft_lang_guess + graft_stopword_ratio +
    * graft_token_estimate) pays one TextStatsExpr pass PER FUNCTION —
    * let1 binds within a function, never across a SELECT list (plan-
    * read r13) — so the one-struct form is the single-pass answer,
    * like graft_quality_signals for the Gopher gate. Field values are
    * the exact [[analyze]] columns (same shared helpers; spec-pinned);
    * the null contract is the struct form's: null text -> null STRUCT
    * (analyze instead nulls per column with lang_guess 'und'). */
  def analyzeStruct(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    let1(textStats(t)) { st =>
      val nD = greatest(st.getField("n_tokens"), lit(1L)).cast("double")
      val swEn = hitRatio(st, 1)
      val mtl = st.getField("sum_token_chars").cast("double") / nD
      when(t.isNotNull, struct(
        st.getField("n_tokens").as("n_tokens"),
        st.getField("bpe_est").as("est_bpe_tokens"),
        length(t).cast("long").as("n_chars"),
        round(swEn, 4).as("stopword_ratio"),
        round(punctRatio(t), 4).as("punct_ratio"),
        round(mtl, 4).as("mean_token_len"),
        qualityFormula(t, swEn, mtl).as("quality"),
        langFold(Seq("en" -> swEn, "de" -> hitRatio(st, 2),
          "es" -> hitRatio(st, 3), "fr" -> hitRatio(st, 4))).as("lang_guess"),
        fingerprint(t).as("fingerprint")))
    }

  /** CCNet-style language-model quality score (Wenzek et al. 2019 use
    * wiki-LM perplexity to rank web text; see PAPERS.md): average
    * surprisal per token under the CORPUS unigram distribution with
    * add-one smoothing, p(t) = (n_t + 1) / (T + V). Low surprisal =
    * typical text, high = gibberish/outlier vocabulary — the cheap,
    * external-model-free member of the perplexity-filter family.
    *
    * Determinism: per-token surprisal is rounded to 6 dp and summed
    * through exact DECIMAL (token order can't matter), then averaged
    * and rounded to 4 dp — engine- and partitioning-independent.
    *
    * Scale shape: one token explode collapsed IMMEDIATELY to (doc,
    * token, k) with map-side combine; the vocab agg derives from that
    * same exchange (one corpus scan total), the token→count join
    * hash-shuffles distinct (doc, token) pairs — never occurrences —
    * on the token key (the vocab of a 100 TB corpus is NOT
    * broadcastable); corpus totals are a scalar broadcast; the final
    * per-doc agg partitions by doc. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Null-id docs are screened ENTIRELY (same rationale as
    // Contamination's screen): the per-doc groupBy would MERGE them
    // into one bogus pseudo-document whose stats cover the union of
    // their tokens, and no downstream join could attribute the row
    // anyway — so unattributable docs contribute neither a row nor
    // corpus-LM counts.
    val tok = df.where(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
    // AGGREGATE BEFORE JOIN (r14): collapse occurrences to one row per
    // (doc, token) with its multiplicity k FIRST — the vocabulary join
    // then shuffles distinct pairs, not every token occurrence (real
    // corpora repeat 30-50% of their tokens within a document), and the
    // map-side partial agg shrinks even that shuffle's input. The vocab
    // table derives FROM the per-doc counts, so the two consumers share
    // one exchange (ReuseExchange) instead of each re-scanning the
    // corpus and re-exploding — the previous shape read the parquet
    // twice. Value parity is exact: sum over occurrences of a 6-dp
    // surprisal == sum over distinct tokens of k * that DECIMAL (the
    // multiply and sum are both exact in decimal space), and
    // n_tokens == sum(k).
    val perDoc = tok.groupBy("id", "t").agg(count(lit(1)).as("k"))
    val vocab = perDoc.groupBy("t").agg(sum("k").as("n"))
    // "total"/"vsize", not T/V: Spark's default case-insensitive
    // resolution would make a `T` column ambiguous with the token `t`.
    val tot = vocab.agg(sum("n").cast("double").as("total"),
      count(lit(1)).cast("double").as("vsize"))
    perDoc.join(vocab, "t")
      .crossJoin(broadcast(tot))
      .withColumn("sp",
        round(-log((col("n").cast("double") + 1.0) / (col("total") + col("vsize"))), 6))
      .groupBy(col("id"))
      .agg(sum("k").cast("long").as("n_tokens"),
        // cast the EXACT decimal sum to double BEFORE the divide (the
        // old occurrence-level form's order) — a decimal/decimal divide
        // would round at decimal scale instead of IEEE
        round(sum(col("sp").cast("decimal(18,6)") * col("k")).cast("double") /
            sum("k").cast("double"), 4)
          .as("avg_surprisal"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_surprisal"))
  }

  /** Bigram (conditional) LM surprisal — the sharper sibling of
    * [[unigramSurprisal]]: average -ln p(w2 | w1) per bigram with
    * add-one smoothing, p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V).
    * Catches locally-incoherent text (shuffled words score high even
    * when every word is common). Same determinism contract: 6
    * dp-rounded surprisals summed through exact DECIMAL, averaged,
    * rounded to 4 dp.
    *
    * Scale shape: bigrams collapse IMMEDIATELY to (doc, bigram, k);
    * the pair-count table derives from that same exchange, and both
    * count joins move distinct pairs on their keys (hash-shuffle —
    * neither side is broadcastable at corpus scale); V is a scalar
    * broadcast; the final per-doc agg partitions by doc. Only docs
    * with >= 2 tokens appear. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Null-id screen — see unigramSurprisal.
    val toks = df.where(col(idCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    // The bigram STRING "w1 w2" is the join key (tokens contain no
    // spaces, so it's injective); w1 re-derives narrowly for the
    // unigram join.
    // AGGREGATE BEFORE JOIN (r14, same rationale as unigramSurprisal):
    // collapse to one row per (doc, bigram) with multiplicity k before
    // any join — the pair-count table derives from the same exchange
    // (ReuseExchange), and both joins move distinct pairs, not
    // occurrences. w1 re-derives AFTER the collapse (narrow split on
    // far fewer rows).
    val bgPerDoc = toks.where(size(col("toks")) >= 2)
      .select(col("id"), explode(QualitySignals.rawBigrams(col("toks"))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("k"))
    val uni = toks.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vsize = uni.agg(count(lit(1)).cast("double").as("vsize"))
    val pair = bgPerDoc.groupBy(col("bg").as("pb")).agg(sum("k").as("c2"))
    bgPerDoc.withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(pair, col("bg") === col("pb"))
      .join(uni, "w1")
      .crossJoin(broadcast(vsize))
      .withColumn("sp", round(-log(
        (col("c2").cast("double") + 1.0) / (col("c1").cast("double") + col("vsize"))), 6))
      .groupBy(col("id"))
      .agg(sum("k").cast("long").as("n_bigrams"),
        // exact decimal sum of k*sp, cast to double before the IEEE
        // divide — the occurrence-level form's value, bit for bit
        round(sum(col("sp").cast("decimal(18,6)") * col("k")).cast("double") /
            sum("k").cast("double"), 4)
          .as("avg_surprisal"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_surprisal"))
  }

  /** Vocabulary coverage analysis — the tokenizer-design question
    * "how much of the corpus do the top-N tokens cover?": the top
    * `topN` tokens by corpus frequency (ties by token), each with its
    * rank, count, and the CUMULATIVE fraction of all token occurrences
    * covered through that rank. Counts are exact integers; the
    * coverage quotient divides exact integers, so the IEEE result is
    * engine-identical without rounding.
    *
    * Scale shape: one explode + token-keyed agg (map-side combine);
    * the ranking window runs over the topN-truncated aggregate (tiny),
    * never the full vocabulary. */
  def vocabCoverage(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total_tokens"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topN)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("cum_cnt",
        sum("cnt").over(Window.orderBy(col("cnt").desc, col("token"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("token"), col("cnt").cast("long").as("cnt"),
        (col("cum_cnt").cast("double") / col("total_tokens").cast("double"))
          .as("cum_coverage"))
  }

  /** Top-k collocations by pointwise mutual information:
    * pmi(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) over corpus bigram and
    * unigram frequencies — the phrase-mining signal ("new york"-style
    * units a whitespace tokenizer splits). `minCount` suppresses the
    * low-frequency noise PMI is notorious for.
    *
    * Scale shape: one unigram agg, one bigram agg (both map-side
    * partial), two vocabulary-sized joins onto the SURVIVING (≥
    * minCount) bigrams only, two one-row count broadcasts. No hint on
    * the unigram side — vocabulary grows with the corpus, AQE decides.
    * PMI is one fixed-shape expression over exact counts, rounded
    * before the rank. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
                   k: Int = 10): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n1 = uni.agg(sum("c").cast("double").as("n1"))
    val n2 = toks.select(greatest(size(col("toks")) - 1, lit(0))
        .cast("long").as("nb"))
      .agg(sum("nb").cast("double").as("n2"))
    toks.where(size(col("toks")) >= 2)
      .select(explode(QualitySignals.rawBigrams(col("toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .withColumn("pmi", round(log(
        col("c12").cast("double") * col("n1") * col("n1") /
          (col("n2") * col("c1").cast("double") * col("c2").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("bg"))
      .limit(k)
      .select("bg", "c12", "pmi")
  }

  /** Per-document TF-IDF top-k keyword extraction: tf = in-doc term
    * count, idf = ln((1 + N) / (1 + df)) (smoothed — never negative,
    * defined for df = N), weight = tf * idf rounded to 6 dp BEFORE the
    * per-doc rank with a token tie-break, so the selected keywords are
    * engine- and partitioning-independent.
    *
    * Scale shape: one explode + (doc, token) hash-shuffle agg with
    * map-side combine; df is a token-keyed agg joined back on the
    * token key — NOT broadcast: the vocabulary of a 100 TB corpus is
    * vocab-sized/unbounded (AQE may still broadcast it at small scale,
    * which is a safe runtime decision); the corpus size N is a scalar
    * broadcast; the per-doc top-k is a window PARTITIONED BY doc —
    * parallel in the number of documents, never a global sort. */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Null-id screen — see unigramSurprisal (Window.partitionBy("id")
    // would merge every null-id doc's tokens into one top-k).
    val tok = df.where(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    // df derives from its own NARROW distinct-tokens explode, not from
    // tf: the tf subtree can't be exchange-reused across its two
    // consumers (column pruning makes the subplans differ), so deriving
    // df from tf re-runs the full (id, token) shuffle. This pass
    // partial-aggregates straight to (token, count) — same values
    // (df = number of docs containing the token), one cheap shuffle.
    val dfreq = df.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val w = tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("weight", round(col("tf").cast("double") *
        log((lit(1.0) + col("n_docs").cast("double")) /
          (lit(1.0) + col("df").cast("double"))), 6))
    w.withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("weight").desc, col("token"))))
      .where(col("rank") <= k)
      .select(col("id").as(idCol), col("rank").cast("long").as("rank"),
        col("token"), col("weight"))
  }
}
