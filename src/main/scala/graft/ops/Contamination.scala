package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark-contamination check: for each candidate document, how many
  * of its word n-grams also appear anywhere in a benchmark/eval set —
  * the decontamination pass every serious pretraining pipeline runs
  * (n-gram overlap against eval sets, as in GPT-3 App. C / PaLM §8;
  * see PAPERS.md). The reference has nothing comparable; it is a
  * first-class training-data operator here.
  *
  * Scale shape: the benchmark n-gram set is DISTINCT n-grams of the
  * (small) eval corpus; candidates explode their n-grams and probe it
  * with an inner hash join, then one groupBy(doc) count. The corpus-
  * side explode is the only large flow and it partitions by document;
  * no all-pairs anything. The bench side carries NO broadcast hint
  * (r13): its size is an eval-set contract the plan cannot verify, so
  * the static plan is an honest shuffle join and AQE's stats-driven
  * runtime conversion broadcasts it exactly when it is actually small
  * — a 100M-gram eval set degrades to the shuffle join instead of
  * OOMing every executor on a forced build side.
  */
object Contamination {

  /** Per-candidate overlap counts against `bench`'s distinct n-grams.
    * Returns (idCol, n_ngrams, n_overlap, contamination_frac) for
    * candidates with >= 1 overlapping n-gram; n_ngrams counts the
    * candidate's distinct n-grams, contamination_frac = n_overlap /
    * n_ngrams rounded to 4 dp. Callers decide the drop threshold.
    *
    * Null-id candidates are screened out: the per-doc groupBy would
    * otherwise MERGE every null-id doc (with equal n_ngrams) into one
    * bogus row, and no downstream join could attribute the result
    * anyway. [[decontaminate]] drops them for the same reason.
    *
    * Candidate ids must be UNIQUE, and the check is STRUCTURAL (the
    * old overlap > n_ngrams heuristic only caught duplicates whose
    * summed overlap happened to exceed the count — partial-overlap
    * duplicates silently inflated contamination_frac, and
    * differing-text duplicates emitted two rows per id): shingles are
    * distinct per doc and bench grams are distinct, so with unique ids
    * every joined (id, shingle) pair is unique and every id has ONE
    * n-gram count — a repeated shingle within an id (count !=
    * count distinct) or two n-gram counts (min != max) is a duplicate
    * id, and RAISES. */
  def ngramOverlap(candidates: DataFrame, bench: DataFrame,
                   idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val benchGrams = bench
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .distinct()
    val withSh = candidates.where(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), n).as("shs"))
    // Candidate n-gram set size comes narrowly from the array length
    // (shingles are distinct within a doc) — no extra aggregate.
    val exploded = withSh.select(col("id"), size(col("shs")).as("n_ngrams"),
      explode(col("shs")).as("sh"))
    exploded.join(benchGrams, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__cnt"),
        countDistinct(col("sh")).as("__dsh"),
        min(col("n_ngrams")).as("__nmin"),
        max(col("n_ngrams")).as("__nmax"))
      .select(
        col("id").as(idCol),
        col("__nmax").cast("long").as("n_ngrams"),
        col("__cnt").cast("long").as("n_overlap"),
        // Third net (__cnt > __nmax): duplicate ids with EQUAL n-gram
        // counts but DISJOINT shingle sets pass both structural checks
        // (every joined pair unique, one count) yet sum more overlap
        // than one doc has n-grams — the case the old heuristic caught
        // and the structural rewrite alone would emit as frac > 1.
        when(col("__cnt") =!= col("__dsh") || col("__nmin") =!= col("__nmax")
            || col("__cnt") > col("__nmax"),
          raise_error(concat(
            lit("ngramOverlap: duplicate candidate id (same shingle " +
              "joined twice, or two n-gram counts under one id): "),
            col("id").cast("string"))))
          .otherwise(
            round(col("__cnt").cast("double") / col("__nmax").cast("double"), 4))
          .as("contamination_frac"))
  }

  /** Decontaminate: drop candidates whose contamination_frac meets the
    * threshold; everything else (including zero-overlap docs the
    * inner join never surfaced) passes through.
    *
    * Null-id candidates are DROPPED, not passed: the anti-join's
    * null-rejecting equality would otherwise wave a fully contaminated
    * null-id row straight into the training set (an unattributable doc
    * cannot be cleared, so the conservative direction is out — the same
    * call cohort retention makes for null users). */
  def decontaminate(candidates: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int = 3,
                    maxFrac: Double = 0.2): DataFrame = {
    val drop = ngramOverlap(candidates, bench, idCol, textCol, n)
      .where(col("contamination_frac") >= maxFrac)
      .select(col(idCol))
    candidates.where(col(idCol).isNotNull)
      .join(drop, Seq(idCol), "left_anti")
  }
}
