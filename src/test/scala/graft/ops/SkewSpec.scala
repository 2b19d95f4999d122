package graft.ops

import graft.SparkSpec
import graft.examples.SkewCorpus
import org.apache.spark.sql.functions._

/** Pins that the skew machinery WINS on the corpus shape it exists for
  * (round-8 verdict item 1). Every count below is exact arithmetic over
  * a deterministic planted-Zipf corpus, so regressions in the cap or
  * the prefix filter change a pinned integer, not a timing.
  *
  * Corpus: 300 planted near-dup families (A = 16 unique family tokens,
  * B = same minus the last token plus one unique token → content
  * Jaccard 13/15), plus boilerplate phrases planted on A-docs with
  * periods 4/8/16 (dfs 150/75/38 — all far above the content df of 2).
  *
  * The arithmetic: every pair of period-4 docs shares a boilerplate
  * shingle, so the naive equi-join admits C(150,2) = 11175 hot pairs on
  * top of the 300 content pairs; the cap (df > 20 dropped) and the
  * ascending-df prefix order (hot shingles never fit in a 16-token
  * doc's prefix) both reduce the candidate set to EXACTLY the 300
  * content pairs — a 38× reduction that grows quadratically with
  * corpus size while 300 grows linearly. */
class SkewSpec extends SparkSpec {

  private val nFamilies = 300

  private def corpus = {
    import spark.implicits._
    val rows = (0 until nFamilies).flatMap { i =>
      val fam = (0 until 16).map(t => s"f${i}_t$t")
      val a = (2L * i, fam.mkString(" "))
      val b = (2L * i + 1, (fam.dropRight(1) :+ s"u$i").mkString(" "))
      Seq(a, b)
    }
    SkewCorpus.withBoilerplate(
      rows.toDF("doc_id", "text"), "doc_id", "text", periods = Seq(4, 8, 16))
  }

  test("naive candidate count explodes quadratically; cap and prefix both bound it to the content pairs") {
    val docs = corpus
    val naive = Dedup.candidatePairs(docs, "doc_id", "text", 3, None).count()
    val capped = Dedup.candidatePairs(docs, "doc_id", "text", 3, Some(20L)).count()
    val prefix = Dedup.prefixCandidatePairs(docs, "doc_id", "text", 3, 0.5).count()
    // 150 period-4 docs pair all-with-all through the hot shingles
    assert(naive == 11175L + 300L, s"naive=$naive")
    assert(capped == 300L, s"capped=$capped")
    assert(prefix == 300L, s"prefix=$prefix")
  }

  test("prefixJaccardPairs stays EXACT under planted skew (identical to the naive join)") {
    val docs = corpus
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val naive = norm(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, None))
    val pref = norm(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(pref == naive, s"prefix path diverged: ${pref.size} vs ${naive.size}")
    assert(naive.nonEmpty)
  }

  test("the cap RESCUES recall that boilerplate dilution destroys") {
    val docs = corpus
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until nFamilies).map(i => (2L * i, 2L * i + 1)).toSet
    // naive Jaccard: 3 appended phrases dilute an A-doc's shingle set
    // below threshold — the 38 heaviest-boilerplate families are LOST
    val naive = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, None))
    val lost = planted -- naive
    assert(lost.nonEmpty && lost.forall { case (a, _) => a % 16 == 0 },
      s"expected the %16 families lost to dilution, got ${lost.size}")
    // capped Jaccard scores the REDUCED sets: all 300 planted pairs
    // found, and nothing else
    val capped = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
      Some(20L)))
    assert(capped == planted,
      s"capped found ${capped.size}, missing ${(planted -- capped).size}")
  }

  test("zipfDomain: one hot key with half the rows, the rest spread (capPerKey stays bounded)") {
    import spark.implicits._
    val rows = (0L until 2000L).toDF("event_id")
      .withColumn("value", pmod(col("event_id") * 37L, lit(1000L)).cast("double"))
      .withColumn("domain", SkewCorpus.zipfDomain(col("event_id")))
    val hot = rows.where(col("domain") === "hot.example.com").count()
    assert(hot == 1000L, s"hot share $hot")
    val capped = Sampling.capPerKey(rows, Seq("domain"), 5,
      priority = Seq(-col("value"), col("event_id")))
    // hot key contributes exactly cap rows; every other key at most cap
    assert(capped.where(col("domain") === "hot.example.com").count() == 5L)
    val worst = capped.groupBy("domain").count().agg(max("count")).head().getLong(0)
    assert(worst <= 5L)
    // parity with the window shape it replaces
    import org.apache.spark.sql.expressions.Window
    val win = rows.withColumn("rank", row_number().over(
        Window.partitionBy("domain").orderBy(col("value").desc, col("event_id"))))
      .where(col("rank") <= 5)
    assert(capped.count() == win.count())
  }
}
