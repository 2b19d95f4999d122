package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainFromCounts: hand-checked merge sequence on the classic low/lower corpus") {
    // pair counts round 1: (l,o)=10, (o,w)=10, (w,e)=5, (e,r)=2,
    // (e,s)=3, (s,t)=3 -> tie (l,o) vs (o,w) at 10 breaks lexicographic
    val counts = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L))
    val merges = Bpe.trainFromCounts(counts, 3)
    assert(merges(0) == (("l", "o")))
    // round 2: (lo,w)=10 dominates
    assert(merges(1) == (("lo", "w")))
    // round 3: (low,e)=5 beats (e,s)/(s,t)=3 and (e,r)=2
    assert(merges(2) == (("low", "e")))
  }

  test("train: distributed word counting feeds the same loop; encode round-trips") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(3)("lowest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges == Bpe.trainFromCounts(
      Seq(("low", 5L), ("lower", 2L), ("lowest", 3L)), 3))
    assert(Bpe.encodeWord("lowest", merges) == Seq("lowe", "s", "t"))
    assert(Bpe.encodeWord("low", merges) == Seq("low"))
    // round-trip property: concatenated subwords reconstruct the word
    Seq("low", "lower", "lowest", "slow", "unseen").foreach { w =>
      assert(Bpe.encodeWord(w, merges).mkString == w)
    }
  }

  test("encodeCol tokenizes a column with the learned merges") {
    val docs = Seq((0L, "low lowest")).toDF("id", "text")
    val merges = Bpe.trainFromCounts(
      Seq(("low", 5L), ("lower", 2L), ("lowest", 3L)), 3)
    val got = docs.select(Bpe.encodeCol(org.apache.spark.sql.functions.col("text"), merges))
      .as[Seq[String]].head
    assert(got == Seq("low", "lowe", "s", "t"))
  }

  test("train and encode share the lowercase pre-pass (capitalized corpus still merges)") {
    val docs = Seq((0L, "Low LOW Lower"), (1L, "low\tlowest  low")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", 2)
    // all case variants count as "low"/"lower"/"lowest": (l,o) then (lo,w)
    assert(merges == IndexedSeq(("l", "o"), ("lo", "w")))
    val got = docs.where($"id" === 0L)
      .select(Bpe.encodeCol(org.apache.spark.sql.functions.col("text"), merges))
      .as[Seq[String]].head
    // the learned merges FIRE on the capitalized text after lowercasing
    assert(got == Seq("low", "low", "low", "e", "r"))
  }

  test("encodeCol lowercases like SQL lower() even under a tr_TR default locale") {
    val docs = Seq((0L, "III iii")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", 2)
    assert(merges == IndexedSeq(("i", "i"), ("ii", "i")))
    // Under tr_TR, String.toLowerCase("III") is dotless "ııı" and no
    // trained merge would ever fire; the expression must take the same
    // locale-independent ASCII path SQL lower() takes in train().
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
    try {
      val got = docs
        .select(Bpe.encodeCol(org.apache.spark.sql.functions.col("text"), merges))
        .as[Seq[String]].head
      assert(got == Seq("iii", "iii"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("merge count caps at available pairs; single-char vocab trains nothing") {
    assert(Bpe.trainFromCounts(Seq(("a", 10L), ("b", 2L)), 5).isEmpty)
    val m = Bpe.trainFromCounts(Seq(("ab", 1L)), 100)
    assert(m == IndexedSeq(("a", "b")))
  }

  test("vocab cutoffs bound the driver collect without changing the merges") {
    // 5x low, 3x lowest, 2x lower, plus a one-off long-tail "word"
    // (the web-corpus noise class minCount exists to drop).
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(3)("lowest") ++ Seq("zq9xk7"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val full = Bpe.train(docs, "text", 3)
    // minCount=2 drops only the singleton tail word -> identical merges
    assert(Bpe.train(docs, "text", 3, minCount = 2L) == full)
    // maxVocab=3 keeps the top-3 words by count (all the real ones),
    // cutting the collect to a fixed driver-side bound -> identical
    assert(Bpe.train(docs, "text", 3, maxVocab = 3) == full)
    // both knobs together
    assert(Bpe.train(docs, "text", 3, minCount = 2L, maxVocab = 3) == full)
    // maxVocab tie-break is deterministic: equal counts keep the
    // lexicographically smaller word ("ab" over "cd")
    val tied = Seq("ab", "cd", "ab", "cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    assert(Bpe.train(tied, "text", 1, maxVocab = 1) == IndexedSeq(("a", "b")))
  }

  test("astral characters are single symbols, not surrogate halves") {
    // Pre-fix w.map(_.toString) split non-BMP chars into lone UTF-16
    // surrogates: train() counted cross-character (lo,hi) surrogate
    // pairs as merge candidates, and unmerged lone surrogates came out
    // of encodeCol as '?' — every distinct emoji collapsed to the same
    // corrupt token.
    val grin = "😀" // U+1F600
    val rocket = "🚀" // U+1F680
    assert(Bpe.encodeWord(grin + "x", IndexedSeq.empty) == Seq(grin, "x"))
    // merges fire on whole code points
    val m = Bpe.trainFromCounts(Seq((grin + grin, 5L), (grin + rocket, 2L)), 1)
    assert(m == IndexedSeq((grin, grin)))
    assert(Bpe.encodeWord(grin + grin + rocket, m) == Seq(grin + grin, rocket))
    // and through the fused expression: distinct emoji stay distinct
    val docs = Seq((0L, s"$grin$grin$rocket $rocket")).toDF("id", "text")
    val got = docs.select(Bpe.encodeCol(org.apache.spark.sql.functions.col("text"), m))
      .as[Seq[String]].head
    assert(got == Seq(grin + grin, rocket, rocket))
  }

  test("memoized encodeCol matches per-word encodeWord over a repeated-word corpus") {
    // The expression caches word -> tokens per thread (Zipfian corpora
    // re-encode the same words constantly); parity with the uncached
    // driver-side encoder across partitions pins the cache's
    // correctness, including eviction-order independence.
    val merges = Bpe.trainFromCounts(
      Seq(("low", 5L), ("lower", 2L), ("lowest", 3L)), 3)
    val words = Seq("low", "lowest", "lower", "slow", "unseen")
    val docs = (0L until 200L).map { i =>
      (i, Seq.tabulate(8)(j => words(((i + j) % words.length).toInt)).mkString(" "))
    }.toDF("id", "text").repartition(7)
    val got = docs.select($"id",
        Bpe.encodeCol(org.apache.spark.sql.functions.col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    (0L until 200L).foreach { i =>
      val expect = Seq.tabulate(8)(j => words(((i + j) % words.length).toInt))
        .flatMap(w => Bpe.encodeWord(w, merges))
      assert(got(i) == expect, s"row $i")
    }
  }
}
