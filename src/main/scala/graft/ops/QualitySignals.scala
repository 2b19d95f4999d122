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
    val symbolRatio = symbolRatioOf(t)
    // A NULL text must null EVERY signal (the stated contract). With
    // the fused kernel the stats struct is already NULL for null text
    // (TokenStatsExpr is null-in/null-out, so getField propagates the
    // null) — this wrapper is a belt-and-braces contract pin, kept so
    // the published null behavior never silently depends on the
    // kernel's internals.
    def nullForNullText(c: Column): Column =
      when(t.isNull, lit(null)).otherwise(c)
    // Materialize the fused stats struct as a REAL aliased column and
    // project the four signal fields from the attribute: embedding a
    // copy of the tokenSignals tree in each withColumn relies on
    // whole-stage-codegen subexpression elimination to dedupe, and
    // under interpreted/codegen-disabled regimes the kernel evaluated
    // 4x per row. CollapseProject will not inline a non-cheap alias
    // referenced more than once, so this is one kernel pass under
    // EVERY regime.
    val sigCol = "__graft_token_signals"
    // same guard class as ngramCharSignals' __rep_sig: withColumn would
    // silently REPLACE a user column of this name, and the drop below
    // would then destroy it.
    require(!graft.Cols.has(df, sigCol),
      s"signals: the input already has a column named $sigCol " +
        "(session resolver); rename it first")
    val out = df
      .withColumn(sigCol, tokenSignals(t))
      .withColumn("n_tokens", nullForNullText(col(sigCol).getField("n_tokens")))
      .withColumn("distinct_token_ratio",
        nullForNullText(col(sigCol).getField("distinct_token_ratio")))
      .withColumn("top_token_frac",
        nullForNullText(col(sigCol).getField("top_token_frac")))
      .withColumn("dup_bigram_frac",
        nullForNullText(col(sigCol).getField("dup_bigram_frac")))
      .withColumn("symbol_ratio", symbolRatio)
      .drop(sigCol)
    // coalesce to FALSE: a null text nulls every signal, and a null
    // keep flag would put the doc in NEITHER the keep nor the drop set
    // (both where(keep) and where(!keep) exclude it). Undecodable text
    // is a drop, not a limbo row.
    out.withColumn("gopher_keep",
      coalesce(
        keepOf(col("n_tokens"), col("distinct_token_ratio"),
          col("top_token_frac"), col("dup_bigram_frac"), col("symbol_ratio")),
        lit(false)))
  }

  /** The five signals + keep flag as ONE struct column — the SQL
    * surface (`graft_quality_signals`). Identical arithmetic to
    * [[signals]] (same extracted builders); the null contract is the
    * struct form's: null text -> null STRUCT (matching
    * graft_ngram_repetition), so the keep field inside a non-null
    * struct is never null and a SQL caller writes
    * `coalesce(s.gopher_keep, false)` for the drop-not-limbo rule —
    * exactly what [[signals]] does for its column form. */
  def signalsStruct(t: Column): Column =
    TextFunctions.let1(tokenSignals(t)) { s =>
      TextFunctions.let1(symbolRatioOf(t)) { sr =>
        val n = s.getField("n_tokens")
        val dr = s.getField("distinct_token_ratio")
        val tt = s.getField("top_token_frac")
        val db = s.getField("dup_bigram_frac")
        when(t.isNotNull, struct(
          n.as("n_tokens"),
          dr.as("distinct_token_ratio"),
          tt.as("top_token_frac"),
          db.as("dup_bigram_frac"),
          sr.as("symbol_ratio"),
          coalesce(keepOf(n, dr, tt, db, sr), lit(false)).as("gopher_keep")))
      }
    }

  /** The Gopher keep conjunction over the five (ROUNDED) signals. */
  private def keepOf(nTokens: Column, distinctRatio: Column, topFrac: Column,
                     dupBigram: Column, symbolRatio: Column): Column =
    nTokens.between(10L, 100000L) &&
      distinctRatio >= 0.3 &&
      topFrac <= 0.2 &&
      dupBigram <= 0.05 &&
      symbolRatio <= 0.1

  /** The four token-derived signals as a struct (shared by [[signals]]
    * and [[signalsStruct]]). Counts come from ONE fused JVM pass
    * ([[graft.functions.TokenStatsExpr]] — the HOF folds below never
    * enter codegen and allocated a struct per token for the top-run
    * fold); the ratios and their 4-dp rounding stay in Column space
    * over the exact integer counts, so the values are identical to
    * [[tokenSignalsSql]] by construction (parity spec-pinned, and the
    * q_repetition oracle replays the HOF form externally). */
  private[graft] def tokenSignals(t: Column): Column = {
    val stats = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TokenStatsExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(t)))
    TextFunctions.let1(stats) { st =>
      val n = st.getField("n_tokens")
      val nD = greatest(n, lit(1)).cast("double")
      val nBg = st.getField("n_bigrams")
      struct(
        n.as("n_tokens"),
        round(st.getField("n_distinct").cast("double") / nD, 4)
          .as("distinct_token_ratio"),
        round(st.getField("top_freq").cast("double") / nD, 4)
          .as("top_token_frac"),
        when(nBg === 0, lit(0.0)).otherwise(
          round(st.getField("n_dup_bigrams").cast("double") /
            nBg.cast("double"), 4)).as("dup_bigram_frac"))
    }
  }

  /** The interpreted HOF construction [[tokenSignals]] replaced — kept
    * as the oracle-parity reference (the DuckDB q_repetition oracle
    * replicates THIS form; QualitySignalsSpec pins the fused pass
    * against it on the corpus). */
  private[graft] def tokenSignalsSql(t: Column): Column =
    TextFunctions.let1(TextFunctions.tokens(t)) { toks =>
      val n = size(toks)
      val nD = greatest(n, lit(1)).cast("double")
      val distinctRatio = round(size(array_distinct(toks)).cast("double") / nD, 4)
      // Most-frequent-token share as a run-length max over the SORTED
      // tokens: O(m log m) per row, not the O(distinct * m)
      // filter-count square (real corpora have 1k-10k-token documents,
      // where the square is 10^6-10^8 compares per row). Stays narrow
      // (no explode/agg). Null text: the run fold's when() falls to
      // its otherwise branch on a null condition, but every signal is
      // nulled EXPLICITLY below ("a null text nulls every signal"), so
      // undecodable docs still can't look maximally diverse.
      val topTokenFrac = round(
        TextFunctions.let1(array_sort(toks)) { ss =>
          TextFunctions.let1(size(ss)) { sz =>
            when(sz >= 2,
              aggregate(
                sequence(lit(1), sz - 1),
                struct(lit(1L).as("run"), lit(1L).as("best")),
                (st, i) => TextFunctions.let1(
                  when(element_at(ss, i + lit(1)) === element_at(ss, i),
                    st.getField("run") + 1L).otherwise(lit(1L))) { run =>
                  struct(run.as("run"),
                    greatest(st.getField("best"), run).as("best"))
                },
                st => st.getField("best")))
              .otherwise(lit(1L))
          }
        }.cast("double") / nD, 4)
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
  /** Symbol ratio over Unicode letter/digit classes, NOT [A-Za-z0-9]:
    * both engines (Java regex and DuckDB's RE2) agree on \p{L}/\p{N}
    * general categories, and the ASCII class counted every ä/é/ñ — and
    * every non-Latin letter — as a symbol, structurally failing
    * non-English documents at the 0.1 gate. */
  private def symbolRatioOf(t: Column): Column = round(
    (length(t) - length(regexp_replace(t, "[^\\p{L}\\p{N} ]", ""))).cast("double") /
      greatest(length(t), lit(1)).cast("double"), 4)

  /** Gopher §A1.1 keep-thresholds for the n-gram char-mass signals
    * (Rae et al. 2021 Table A1): top-n-gram fractions for n=2..4,
    * duplicate-n-gram coverage for n=5..10.
    *
    * PROVENANCE NOTE (threshold vs statistic): the THRESHOLD VALUES are
    * the paper's, but [[ngramCharSignals]] applies the top-n ones to a
    * deliberately different statistic — max char mass over grams
    * repeating >= 2 — where the paper thresholds "the most frequent
    * n-gram"'s char fraction (nonzero even when the top gram is
    * unique, and tie-broken by counter insertion order no external
    * engine can replay). Near the thresholds, keep/drop can therefore
    * diverge from a corpus filtered by a verbatim Gopher
    * implementation; the trade is documented determinism (ADVICE r11).
    * The dup-n coverage statistic IS the paper's union-of-spans. */
  val TopNgramThresholds: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramThresholds: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  private def topColName(n: Int) = s"top_${n}_gram_char_frac"
  private def dupColName(n: Int) = s"dup_${n}_gram_char_frac"

  /** Gopher §A1.1's SECOND repetition family — the n-gram
    * character-mass signals [[signals]] doesn't cover:
    *
    *  - `top_{n}_gram_char_frac` (n in `topNs`): character mass of the
    *    heaviest REPEATED word n-gram — max over n-grams occurring at
    *    least twice of `occurrences × gram-token-chars` — over the
    *    document's total token character mass. A document with no
    *    repeated n-gram scores 0.0. (Deliberately a max over NUMBERS,
    *    not "the most frequent n-gram": frequency ties there resolve
    *    by counter insertion order, which no external engine can be
    *    asked to reproduce; char mass is the quantity the filter
    *    thresholds anyway.)
    *  - `dup_{n}_gram_char_frac` (n in `dupNs`): fraction of token
    *    characters covered by AT LEAST ONE occurrence of a duplicated
    *    n-gram — overlapping occurrences count each token once, the
    *    union-of-spans semantics Rae et al. specify for n=5..10.
    *  - `rep_keep`: AND of `signal <= threshold` over every computed
    *    column (thresholds from [[TopNgramThresholds]] /
    *    [[DupNgramThresholds]]), decided on the ROUNDED (4 dp) values
    *    so the flag cannot flip on a last-ulp difference, and FALSE
    *    for null text (a drop, not a limbo row — same contract as
    *    `gopher_keep`).
    *
    * Character mass counts TOKEN characters only (the single-space
    * separators are excluded identically on both engines: a gram's
    * token chars = `length(gram) - (n-1)` since grams join with one
    * space). Everything is a narrow per-row projection — no shuffle,
    * no UDF. A null text nulls every signal column.
    *
    * Two value-identical execution paths (PropertySpec pins both to a
    * brute-force reference; the DuckDB oracle replays the definition):
    *  - `fused = true` (default): one imperative JVM pass per row
    *    ([[graft.functions.NgramRepetitionExpr]]) producing integer
    *    masses; the divide + round stays in SQL. The hot-path form —
    *    the gate runs over EVERY document of a corpus, and interpreted
    *    per-element HOF lambdas are a ~10x tax there.
    *  - `fused = false`: the pure higher-order-function reference form
    *    (sorted-array run-length folds, O(m log m) per row per n —
    *    itself already the scale-correct shape vs a filter-count
    *    square, which is 10^6-10^8 compares at real 1k-10k-token
    *    document lengths).
    *
    * The reference ingests text verbatim (encoder.py:54-88); this is
    * part of the pre-embedding quality gate a 100 TB corpus needs. */
  def ngramCharSignals(df: DataFrame, textCol: String,
                       topNs: Seq[Int] = Seq(2, 3, 4),
                       // The FULL A1.1 dup set. r11 defaulted to
                       // Seq(5, 10) — a silently narrowed gate: the
                       // default pipeline skipped Gopher's dup-6..9
                       // rules and kept docs the full rule set drops
                       // (ADVICE r11; spec-pinned by the 6-gram gate
                       // test). Callers wanting the cheaper pair pass
                       // it explicitly now.
                       dupNs: Seq[Int] = 5 to 10,
                       fused: Boolean = true): DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty,
      "ngramCharSignals: at least one n-gram size is required")
    require(topNs.forall(_ >= 2) && dupNs.forall(_ >= 2),
      s"ngramCharSignals: n-gram sizes must be >= 2 (got top=$topNs dup=$dupNs)")
    require(topNs.forall(TopNgramThresholds.contains),
      s"ngramCharSignals: no keep-threshold for top n in " +
        s"${topNs.filterNot(TopNgramThresholds.contains)} (known: 2..4)")
    require(dupNs.forall(DupNgramThresholds.contains),
      s"ngramCharSignals: no keep-threshold for dup n in " +
        s"${dupNs.filterNot(DupNgramThresholds.contains)} (known: 5..10)")
    require(topNs.distinct == topNs && dupNs.distinct == dupNs,
      s"ngramCharSignals: duplicate n-gram sizes (top=$topNs dup=$dupNs) " +
        "would mint ambiguous signal fields")
    val outNames = topNs.map(topColName) ++ dupNs.map(dupColName) :+ "rep_keep"
    // `__rep_sig` is the internal struct binding — same guard class as
    // seededShuffle's `__shuffle_key`: withColumn would silently
    // REPLACE a user column of that name.
    val clash = graft.Cols.overlap(df, outNames :+ "__rep_sig")
    require(clash.isEmpty,
      s"ngramCharSignals writes ${clash.mkString(", ")} — the input already " +
        "has such a column (session resolver); rename it first")

    val t = col(textCol)

    if (fused) {
      // One imperative pass per row -> integer masses; fracs derive in
      // SQL from the SAME longs the HOF path folds to, so the two
      // paths are exactly equal (PropertySpec). A null text nulls the
      // struct via the expression's null-safe eval — the same explicit
      // contract as the HOF path's isNull guard (no size(null)
      // dependence under any regime).
      val masses = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.NgramRepetitionExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(t), topNs, dupNs))
      val withM = df.withColumn("__rep_sig", masses)
      val sigRef = col("__rep_sig")
      val tot = greatest(sigRef.getField("tot_chars").cast("double"), lit(1.0))
      def frac(field: String): Column =
        round(sigRef.getField(field).cast("double") / tot, 4)
      val keep = (topNs.map(n => frac(s"top_mass_$n") <= TopNgramThresholds(n)) ++
        dupNs.map(n => frac(s"dup_mass_$n") <= DupNgramThresholds(n)))
        .reduce(_ && _)
      return withM.select(
        df.columns.map(col).toSeq ++
          (topNs.map(n => frac(s"top_mass_$n").as(topColName(n))) ++
            dupNs.map(n => frac(s"dup_mass_$n").as(dupColName(n)))) :+
          coalesce(keep, lit(false)).as("rep_keep"): _*)
    }

    // ---- HOF reference form (fused = false) ----

    // Word n-grams at every start position (empty when the doc is
    // shorter than n — guarded: sequence(0, negative) would DESCEND).
    def gramsFor(toks: Column, m: Column, n: Int): Column =
      when(m >= n,
        transform(sequence(lit(0), m - n),
          p => concat_ws(" ", slice(toks, p + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))

    // Frequency counting runs on SORTED grams (equal grams are
    // adjacent; any total order works, so the sort basis is not
    // value-visible): O(m log m) per row, NOT the O(distinct x grams)
    // filter-count square — real corpora have 1k-10k-token documents,
    // where the square is 10^6-10^8 string compares per row.

    // max over repeated grams of occurrences * token chars, as a
    // run-length fold: run x charlen grows with the run, so taking the
    // max incrementally at each extension sees every full run's mass.
    def topMass(toks: Column, m: Column, n: Int): Column =
      TextFunctions.let1(array_sort(gramsFor(toks, m, n))) { ss =>
        TextFunctions.let1(size(ss)) { sz =>
          when(sz >= 2,
            aggregate(
              sequence(lit(1), sz - 1),
              struct(lit(1L).as("run"), lit(0L).as("best")),
              (st, i) => TextFunctions.let1(
                when(element_at(ss, i + lit(1)) === element_at(ss, i),
                  st.getField("run") + 1L).otherwise(lit(1L))) { run =>
                struct(run.as("run"),
                  greatest(st.getField("best"),
                    when(run >= 2L,
                      run * (length(element_at(ss, i + lit(1))) - lit(n - 1))
                        .cast("long"))
                      .otherwise(lit(0L))).as("best"))
              },
              st => st.getField("best")))
            .otherwise(lit(0L))
        }
      }

    // distinct grams occurring >= 2 times, appended exactly when a
    // run FIRST reaches length 2.
    def dupGrams(gs: Column): Column =
      TextFunctions.let1(array_sort(gs)) { ss =>
        TextFunctions.let1(size(ss)) { sz =>
          when(sz >= 2,
            aggregate(
              sequence(lit(1), sz - 1),
              struct(lit(1L).as("run"),
                array().cast("array<string>").as("dups")),
              (st, i) => TextFunctions.let1(
                element_at(ss, i + lit(1)) === element_at(ss, i)) { same =>
                struct(
                  when(same, st.getField("run") + 1L).otherwise(lit(1L))
                    .as("run"),
                  when(same && st.getField("run") === 1L,
                    concat(st.getField("dups"),
                      array(element_at(ss, i + lit(1)))))
                    .otherwise(st.getField("dups")).as("dups"))
              },
              st => st.getField("dups")))
            .otherwise(array().cast("array<string>"))
        }
      }

    // union-of-spans coverage: token idx is covered iff SOME start
    // position p in [idx-n+1, idx] (clamped to valid starts) holds a
    // duplicated gram. The per-position dup flag is membership in the
    // (typically tiny) duplicated-gram set, not a full filter-count.
    def dupCoverMass(toks: Column, m: Column, n: Int): Column =
      when(m >= n,
        TextFunctions.let1(gramsFor(toks, m, n)) { gs =>
          TextFunctions.let1(dupGrams(gs)) { dups =>
            when(size(dups) === 0, lit(0L)).otherwise(
              TextFunctions.let1(
                transform(gs, g => array_contains(dups, g))) { isDup =>
                aggregate(sequence(lit(0), m - 1), lit(0L), (acc, idx) =>
                  acc + when(
                    exists(
                      sequence(greatest(idx - lit(n - 1), lit(0)),
                        least(idx, m - n)),
                      p => element_at(isDup, p + lit(1))),
                    length(element_at(toks, idx + lit(1))).cast("long"))
                    .otherwise(lit(0L)))
              })
          }
        }).otherwise(lit(0L))

    val sig = TextFunctions.let1(TextFunctions.tokens(t)) { toks =>
      TextFunctions.let1(size(toks)) { m =>
        TextFunctions.let1(
          aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double")
        ) { totRaw =>
          val tot = greatest(totRaw, lit(1.0))
          val fields =
            topNs.map(n =>
              round(topMass(toks, m, n).cast("double") / tot, 4)
                .as(topColName(n))) ++
            dupNs.map(n =>
              round(dupCoverMass(toks, m, n).cast("double") / tot, 4)
                .as(dupColName(n)))
          struct(fields: _*)
        }
      }
    }

    // One evaluation of the whole signal struct per row; null text
    // nulls every signal EXPLICITLY (not via size(null) — whose value
    // the legacy sizeOfNull regime changes). Exactly TWO plan nodes —
    // bind the struct, then unpack fields + keep in ONE select: a
    // per-field withColumn fold re-analyzes the (large) HOF expression
    // tree once per column, which multiplies Catalyst planning time
    // in long pipelines (each downstream op re-walks the lineage).
    // The struct stays a multi-referenced non-cheap projection column,
    // so CollapseProject cannot inline it into per-field copies.
    val withSig = df.withColumn("__rep_sig",
      when(t.isNull, lit(null)).otherwise(sig))
    val sigRef = col("__rep_sig")
    val keep = (topNs.map(n =>
        sigRef.getField(topColName(n)) <= TopNgramThresholds(n)) ++
      dupNs.map(n =>
        sigRef.getField(dupColName(n)) <= DupNgramThresholds(n)))
      .reduce(_ && _)
    withSig.select(
      df.columns.map(col).toSeq ++
        outNames.dropRight(1).map(c => sigRef.getField(c).as(c)) :+
        coalesce(keep, lit(false)).as("rep_keep"): _*)
  }
}
