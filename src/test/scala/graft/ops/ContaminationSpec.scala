package graft.ops

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // bench doc holds 3-grams of "the quick brown fox jumps";
  // cand 1 shares a window, cand 2 shares nothing, cand 3 is the
  // bench text verbatim (fully contaminated).
  private lazy val bench = Seq((100L, "the quick brown fox jumps"))
    .toDF("doc_id", "text")
  private lazy val cands = Seq(
    (1L, "a sly quick brown fox runs far"),
    (2L, "entirely different words here"),
    (3L, "the quick brown fox jumps")).toDF("doc_id", "text")

  test("overlap counts and fractions are exact") {
    val got = Contamination.ngramOverlap(cands, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // cand 1: 5 distinct 3-grams, one ("quick brown fox") in bench.
    assert(got(1L) == ((5L, 1L, 0.2)))
    assert(!got.contains(2L)) // zero-overlap docs never surface
    assert(got(3L) == ((3L, 3L, 1.0)))
  }

  test("decontaminate drops only docs at/above the threshold") {
    val kept = Contamination.decontaminate(cands, bench, "doc_id", "text",
        n = 3, maxFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("null-id candidates are screened out, never merged or waved through") {
    import org.apache.spark.sql.functions.{col, lit}
    // Two fully contaminated null-id rows: without the screen they
    // would (a) merge into one bogus overlap row (frac 2.0) and
    // (b) sail through decontaminate's null-rejecting anti-join.
    val nullRows = Seq("the quick brown fox jumps", "the quick brown fox jumps")
      .toDF("text").withColumn("doc_id", lit(null).cast("long"))
      .select("doc_id", "text")
    val withNull = cands.unionByName(nullRows)
    val overlap = Contamination.ngramOverlap(withNull, bench, "doc_id", "text", 3)
    assert(overlap.where(col("doc_id").isNull).isEmpty)
    assert(overlap.count() == 2) // docs 1 and 3, unchanged
    val kept = Contamination.decontaminate(withNull, bench, "doc_id", "text",
        n = 3, maxFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L)) // contaminated null-id rows are OUT
  }

  test("duplicate candidate ids RAISE instead of emitting contamination_frac > 1") {
    // The same doc replayed (e.g. an upstream union repeats a shard):
    // the groupBy merges the equal-n_ngrams rows, overlaps sum, and
    // frac would silently read 2.0 — the exact symptom the null screen
    // exists for, now loud for non-null dups too.
    val dup = cands.unionByName(
      Seq((3L, "the quick brown fox jumps")).toDF("doc_id", "text"))
    val e = intercept[Exception] {
      Contamination.ngramOverlap(dup, bench, "doc_id", "text", 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate candidate id")), msgs(e).mkString("|"))
  }

  test("PARTIAL-overlap duplicates raise too (the old sum>count heuristic missed them)") {
    // Replaying cand 1 doubles its single overlapping shingle: the
    // merged count (2) never exceeds n_ngrams (5), so the old
    // overlap>n_ngrams check passed and frac silently read 0.4 instead
    // of 0.2. The structural check (count != count distinct) fires.
    val dup = cands.unionByName(
      Seq((1L, "a sly quick brown fox runs far")).toDF("doc_id", "text"))
    val e = intercept[Exception] {
      Contamination.ngramOverlap(dup, bench, "doc_id", "text", 3).collect()
    }
    assert(chain(e).exists(_.contains("duplicate candidate id")), chain(e).mkString("|"))
  }

  test("differing-text duplicates raise (two n-gram counts under one id)") {
    // Same id, different text, DISJOINT overlapping shingles — the
    // per-shingle distinct check can't see it, but the two texts carry
    // different n-gram counts (5 vs 3) under one id: min != max fires.
    // Pre-fix this emitted TWO rows for id 1, duplicating any
    // downstream join on the id.
    val dup = cands.unionByName(
      Seq((1L, "big brown fox jumps high")).toDF("doc_id", "text"))
    val e = intercept[Exception] {
      Contamination.ngramOverlap(dup, bench, "doc_id", "text", 3).collect()
    }
    assert(chain(e).exists(_.contains("duplicate candidate id")), chain(e).mkString("|"))
  }

  test("equal-count disjoint-set duplicates raise too (the frac>1 corner)") {
    // Same id, same n-gram COUNT, disjoint shingle sets, both fully in
    // the bench: the per-shingle and count-pair checks both pass, but
    // summed overlap exceeds one doc's n-grams — the third net
    // (__cnt > __nmax) must fire instead of emitting frac = 2.0.
    val twoBench = Seq((100L, "the quick brown fox jumps"),
      (101L, "big dogs sleep all day")).toDF("doc_id", "text")
    val dup = Seq(
      (1L, "the quick brown fox jumps"),
      (1L, "big dogs sleep all day")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Contamination.ngramOverlap(dup, twoBench, "doc_id", "text", 3).collect()
    }
    assert(chain(e).exists(_.contains("duplicate candidate id")), chain(e).mkString("|"))
  }

  private def chain(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))

  test("short texts (fewer than n tokens) have no n-grams and pass") {
    val tiny = Seq((9L, "too short")).toDF("doc_id", "text")
    assert(Contamination.ngramOverlap(tiny, bench, "doc_id", "text", 3).isEmpty)
    assert(Contamination.decontaminate(tiny, bench, "doc_id", "text", 3).count() == 1)
  }
}
