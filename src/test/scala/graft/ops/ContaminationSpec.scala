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

  test("short texts (fewer than n tokens) have no n-grams and pass") {
    val tiny = Seq((9L, "too short")).toDF("doc_id", "text")
    assert(Contamination.ngramOverlap(tiny, bench, "doc_id", "text", 3).isEmpty)
    assert(Contamination.decontaminate(tiny, bench, "doc_id", "text", 3).count() == 1)
  }
}
