package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens + tokenCount") {
    val r = Seq("a b c", "one").toDF("t")
      .select(tokenCount($"t").as("n")).as[Int].collect()
    assert(r.toSeq == Seq(3, 1))
  }

  test("shingles: distinct n-grams; short text -> empty") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(shingles($"t", 3).as("s")).as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Nil)
  }

  test("fused shingles == SQL shingles on real corpus (incl. edge whitespace)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "a  b c d", "x y z", "one two", "a b c a b c a b c")
        .toDF("text"))
    val bad = docs.where(shingles($"text", 3) =!= shinglesSql($"text", 3)).count()
    assert(bad == 0)
    val bad2 = docs.where(shingles($"text", 2) =!= shinglesSql($"text", 2)).count()
    assert(bad2 == 0)
  }

  test("stopword/punct ratios and quality bounds") {
    val df = Seq("the cat is on the mat.", "xyzzy qwerty").toDF("t")
    val r = df.select(
      round(stopwordRatio($"t"), 4).as("sw"),
      round(punctRatio($"t"), 4).as("p"),
      qualityScore($"t").as("q")).collect()
    assert(r(0).getAs[Double]("sw") == 0.5)   // the, is, the / 6 tokens
    assert(r(0).getAs[Double]("p") > 0.0)
    assert(r(1).getAs[Double]("sw") == 0.0)
    val qs = r.map(_.getAs[Double]("q"))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langGuess picks stopword-richest language, und when none") {
    val df = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist ein tier",
      "el perro y la casa es un lugar que no se ve",
      "zzz yyy xxx").toDF("t")
    val r = df.select(langGuess($"t").as("l")).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "es", "und"))
  }

  test("fingerprint normalizes case and whitespace") {
    val r = Seq("Hello   World", "hello world", "different").toDF("t")
      .select(fingerprint($"t").as("f")).as[String].collect()
    assert(r(0) == r(1))
    assert(r(0) != r(2))
  }

  test("simhash63: deterministic, in [0, 2^63), near texts near hashes") {
    val df = Seq(
      "shared words one two three four five six seven eight",
      "shared words one two three four five six seven nine",
      "totally unrelated corpus entry").toDF("t")
    val r = df.select(simhash63($"t").as("h")).as[Long].collect()
    assert(r.forall(_ >= 0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(r(0), r(1)) < ham(r(0), r(2)))
  }

  test("minhashSignature: length, determinism, identical texts identical sigs") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs").toDF("t")
    val r = df.select(minhashSignature($"t", 3, 8).as("s")).as[Seq[Long]].collect()
    assert(r.forall(_.length == 8))
    assert(r(0) == r(1))
    assert(r(0) != r(2))
  }

  test("chunks: overlap windows, clamped tail, single chunk for short text") {
    val df = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b c"),                                  // 3 tokens -> one chunk
      (2L, "")                                        // split('') = [""] -> one chunk
    ).toDF("id", "text")
    val got = df.select($"id", chunks($"text", 4, 2).as("ch")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // size 4, stride 2: starts 0,2,4,6 -> nChunks = floor((10-4+1)/2)+1 = 4
    assert(got(0L) == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(got(1L) == Seq("a b c"))
    assert(got(2L) == Seq(""))
  }

  test("chunks cover every token and respect the overlap invariant") {
    val text = (1 to 53).map(i => s"w$i").mkString(" ")
    val ch = Seq(text).toDF("text").select(chunks($"text", 8, 3).as("ch"))
      .head.getSeq[String](0)
    val toksSeen = ch.flatMap(_.split(" ")).toSet
    assert(toksSeen == (1 to 53).map(i => s"w$i").toSet) // nothing dropped
    ch.sliding(2).foreach { case Seq(a, b) =>
      assert(a.split(" ").takeRight(3).toSeq == b.split(" ").take(3).toSeq)
    case _ => }
  }

  test("fused text stats: every text->value feature == its HOF twin on real corpus") {
    // The text->value forms (and TextAnalysis.analyze) now derive from
    // TextStatsExpr's integer counts; the `...Of` HOF constructions
    // remain the reference the DuckDB oracles replicate. Equality must
    // hold value-for-value on the corpus plus the edge shapes —
    // including a non-BMP token (the kernel counts CODE POINTS like
    // Spark length(), not UTF-16 units like String.length).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "a", "the cat", "el la de que y en",
        "der und ist le la de", "x 𝕏 y 𝕏𝕏", "café über straße",
        "trailing space ", null.asInstanceOf[String]).toDF("text"))
    val toks = tokens($"text")
    val bad = docs.where(!(
      (stopwordRatio($"text") <=> stopwordRatioOf(toks)) &&
      (meanTokenLen($"text") <=> meanTokenLenOf(toks)) &&
      (bpeTokenEstimate($"text") <=> bpeTokenEstimateOf(toks)) &&
      (qualityScore($"text") <=> qualityScoreOf($"text", toks)) &&
      (langGuess($"text") <=> langGuessOf(toks)))).count()
    assert(bad == 0)
  }

  test("fused chunks == HOF chunksSql on real corpus (several shapes, incl. null)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "a", (1 to 7).map(i => s"w$i").mkString(" "),
        (1 to 8).map(i => s"w$i").mkString(" "),
        (1 to 9).map(i => s"w$i").mkString(" "),
        (1 to 53).map(i => s"w$i").mkString(" "),
        null.asInstanceOf[String]).toDF("text"))
    Seq((8, 0), (8, 3), (32, 8), (1, 0)).foreach { case (cs, ov) =>
      val bad = docs.where(!(
        chunks($"text", cs, ov) <=> chunksSql($"text", cs, ov))).count()
      assert(bad == 0, s"chunkSize=$cs overlap=$ov")
    }
  }

  test("fused simhash63 == HOF simhash63Sql on real corpus (incl. empties, unicode, null)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "a  b", "a b c", "café über straße",
        "trailing space ").toDF("text"))
    val bad = docs.where(simhash63($"text") =!= simhash63Sql($"text")).count()
    assert(bad == 0)
    // null text -> null in BOTH forms (null-safe <=> over a null pair)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(simhash63($"text").isNull.as("f"), simhash63Sql($"text").isNull.as("h"))
      .head
    assert(n.getBoolean(0) && n.getBoolean(1))
  }

  test("fused minhash signature == HOF signature on real corpus (incl. empty)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", "a b", "a b c", "a b c d e f g").toDF("text"))
      .select(shingles($"text", 3).as("sh"))
    val bad = docs.where(
      minhashSignatureFused($"sh", 16) =!= minhashSignatureFromShingles($"sh", 16)
    ).count()
    assert(bad == 0)
    // A user-supplied shingle array with NULL elements: the fused
    // kernel must SKIP them like the HOF twin (whose null rehashes
    // array_min ignores) — getUTF8String on a null slot would NPE the
    // task. All-null arrays hit both paths' empty sentinel.
    val raw = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("mixed"),
      array(lit(null).cast("string")).as("allnull"))
    val parity = raw.select(
      (minhashSignatureFused($"mixed", 16) <=>
        minhashSignatureFromShingles($"mixed", 16)).as("m"),
      (minhashSignatureFused($"allnull", 16) <=>
        minhashSignatureFromShingles($"allnull", 16)).as("a")).head
    assert(parity.getBoolean(0) && parity.getBoolean(1))
  }

  test("fused minhash band keys == interpreted banding construction") {
    val numHashes = 16; val bands = 4; val r = numHashes / bands
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(shingles($"text", 3).as("sh"))
    // the construction minhashLshPairs used before the fused expr:
    val interpreted = let1(minhashSignatureFromShingles($"sh", numHashes)) { sig =>
      transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws("|", (b.cast("string") +:
          (0 until r).map(i => element_at(sig, b * r + i + 1).cast("string"))): _*))
    }
    val bad = docs.where(minhashBands($"sh", numHashes, bands) =!= interpreted).count()
    assert(bad == 0)
  }

  test("normalizeText: NFC composition, Cf strip, Zs/Cc collapse, trim, case kept") {
    def norm(ss: String*): Seq[String] =
      ss.toDF("t").select(normalizeText($"t").as("n")).as[String].collect().toSeq
    // combining acute composes to precomposed é (same bytes as "café")
    assert(norm("café") === Seq("café"))
    // tabs/newlines/NBSP collapse to single ASCII spaces; ends trimmed
    assert(norm("  a\t\tb\n c   d  ") === Seq("a b c d"))
    // ZWSP (Cf) strips BEFORE collapse: no double space survives it
    assert(norm("a ​ b", "fin​end", "﻿bom") ===
      Seq("a b", "finend", "bom"))
    // case preserved (lowercase is fingerprint's job), ASCII untouched
    assert(norm("Mixed CASE text") === Seq("Mixed CASE text"))
    // idempotent and null-safe
    val once = norm("  Á ​ B  ").head
    assert(norm(once) === Seq(once))
    val r = Seq[String](null).toDF("t").select(normalizeText($"t")).head()
    assert(r.isNullAt(0))
  }
}
