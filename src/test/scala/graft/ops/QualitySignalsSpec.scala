package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Row =
    QualitySignals.signals(Seq((1L, text)).toDF("id", "text"), "text")
      .select("n_tokens", "distinct_token_ratio", "top_token_frac",
        "dup_bigram_frac", "symbol_ratio", "gopher_keep")
      .head

  test("fused token stats == HOF tokenSignalsSql on real corpus (incl. edge texts)") {
    import org.apache.spark.sql.functions.{col, lit}
    // The fused TokenStatsExpr pass must reproduce the interpreted HOF
    // construction's struct EXACTLY — the DuckDB q_repetition oracle
    // replays the HOF form, so any divergence is an oracle break.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", " ", "a", "a a", "a  b a", "x y x y x y",
        "café über café  über", "trailing space ").toDF("text"))
    val bad = docs.where(!(
      QualitySignals.tokenSignals(col("text")) <=>
        QualitySignals.tokenSignalsSql(col("text")))).count()
    assert(bad == 0)
    // Null text: the fused form nulls the whole struct (null-safe
    // eval), the HOF form yields null fields EXCEPT top_token_frac,
    // where its run fold falls through when(null >= 2) to the
    // otherwise(1L) branch and FABRICATES 1.0 — the very artifact the
    // public surfaces mask (signals()'s nullForNullText, struct form's
    // isNotNull gate; both null-text contracts are pinned elsewhere in
    // this suite). Pin the divergence explicitly so it stays known:
    // the fused kernel is the HONEST form here.
    val f = QualitySignals.tokenSignals(col("text"))
    val h = QualitySignals.tokenSignalsSql(col("text"))
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(
        f.getField("top_token_frac").isNull.as("fused_null"),
        (h.getField("top_token_frac") <=> lit(1.0)).as("hof_fabricates"),
        (f.getField("n_tokens") <=> h.getField("n_tokens")).as("n_eq"),
        (f.getField("distinct_token_ratio") <=>
          h.getField("distinct_token_ratio")).as("d_eq"),
        (f.getField("dup_bigram_frac") <=>
          h.getField("dup_bigram_frac")).as("b_eq")).head
    (0 until 5).foreach(i => assert(n.getBoolean(i), s"field check $i"))
  }

  test("known values on a fully repetitive text") {
    // "a a a a": 4 tokens, 1 distinct, top token 4/4, bigrams
    // ["a a","a a","a a"] -> 2 of 3 duplicated, no symbols.
    val r = sig("a a a a")
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.25)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.6667)
    assert(r.getDouble(4) == 0.0)
    assert(!r.getBoolean(5)) // repetitive + too short -> dropped
  }

  test("known values on a clean distinct text") {
    val words = (1 to 12).map(i => s"w$i")
    val r = sig(words.mkString(" "))
    assert(r.getLong(0) == 12L)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0833) // 1/12
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getBoolean(5))
  }

  test("symbol ratio counts non-alphanumeric-non-space chars") {
    // "a# b$" -> 2 symbols of 5 chars = 0.4
    val r = sig("a# b$")
    assert(r.getDouble(4) == 0.4)
  }

  test("null text is a DROP (false), not a null limbo row") {
    // A null keep flag would exclude the doc from BOTH where(keep)
    // and where(!keep) — 3VL leak.
    val out = QualitySignals.signals(
      Seq((1L, Option.empty[String]), (2L, Option("real text here ok")))
        .toDF("id", "text"), "text")
    assert(out.where($"id" === 1L).select("gopher_keep").head.getBoolean(0) == false)
    assert(out.where(!$"gopher_keep").count() == 2) // both fail (short text too)
  }

  test("null text NULLS every signal: no fabricated -1 counts or 0.0 fractions") {
    // size(null token array) is -1 here: pre-fix a null text got
    // n_tokens = -1, distinct_token_ratio = -1.0 and (via rawBigrams'
    // empty-array mapping) dup_bigram_frac = 0.0 — undecodable docs
    // skewed corpus means and read as zero-duplication documents.
    val row = QualitySignals.signals(
      Seq((1L, Option.empty[String])).toDF("id", "text"), "text")
      .head()
    for (c <- Seq("n_tokens", "distinct_token_ratio", "top_token_frac",
        "dup_bigram_frac", "symbol_ratio"))
      assert(row.isNullAt(row.fieldIndex(c)), s"$c must be NULL for null text")
    assert(!row.getAs[Boolean]("gopher_keep")) // still a DROP, not limbo
  }

  test("gopher_keep boundary: too-symbol-heavy text is dropped") {
    val clean = (1 to 20).map(i => s"tok$i").mkString(" ")
    assert(sig(clean).getBoolean(5))
    val noisy = (1 to 20).map(i => s"t#k$i!").mkString(" ")
    assert(!sig(noisy).getBoolean(5))
  }

  test("accented and non-Latin LETTERS are not symbols: non-English text survives the gate") {
    // The old ASCII class counted every non-[A-Za-z0-9] char as a
    // symbol, so German umlauts — let alone Cyrillic — pushed
    // symbol_ratio toward 1.0 and the 0.1 gate structurally dropped
    // whole languages the pipeline claims to support.
    val de = (1 to 15).map(i => s"schön$i größe$i").mkString(" ")
    val rDe = sig(de)
    assert(rDe.getDouble(4) == 0.0, s"umlauts counted as symbols: ${rDe.getDouble(4)}")
    assert(rDe.getBoolean(5), "clean German text must pass gopher_keep")
    val ru = (1 to 15).map(i => s"слово$i текст$i").mkString(" ")
    assert(sig(ru).getDouble(4) == 0.0, "Cyrillic letters counted as symbols")
    // real punctuation still counts
    assert(sig("a# b$").getDouble(4) == 0.4)
  }

  test("null text NULLS top_token_frac like every other signal (no fake 0.0 diversity)") {
    val out = QualitySignals.signals(
      Seq((1L, Option.empty[String])).toDF("id", "text"), "text")
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("top_token_frac")),
      "null text must null the signal, not report perfect diversity")
    assert(r.isNullAt(r.fieldIndex("distinct_token_ratio")))
  }

  // ---- ngramCharSignals (Gopher §A1.1 second family) ----

  private def ngramRow(text: String): Row =
    QualitySignals.ngramCharSignals(
        Seq((1L, text)).toDF("id", "text"), "text")
      .select("top_2_gram_char_frac", "top_3_gram_char_frac",
        "top_4_gram_char_frac", "dup_5_gram_char_frac",
        "dup_10_gram_char_frac", "rep_keep")
      .head

  test("top-n-gram char mass: freq x token chars of the heaviest repeated gram") {
    // "a b a b a b c": 7 token chars. "a b" x3 -> 3*2=6 -> 0.8571;
    // 3-grams "a b a" x2 -> 6 -> 0.8571; 4-grams "a b a b" x2 -> 8 ->
    // 1.1429 (>1: overlapping occurrences count multiplicatively in
    // the freq x len definition — documented, and exactly why the
    // threshold comparisons still work).
    val r = ngramRow("a b a b a b c")
    assert(r.getDouble(0) == 0.8571)
    assert(r.getDouble(1) == 0.8571)
    assert(r.getDouble(2) == 1.1429)
    assert(!r.getBoolean(5))
  }

  test("no repeated n-gram scores 0.0, not the mass of a unique gram") {
    val r = ngramRow((1 to 12).map(i => s"w$i").mkString(" "))
    assert((0 to 4).forall(r.getDouble(_) == 0.0))
    assert(r.getBoolean(5))
  }

  test("dup coverage is a UNION of spans: overlapping occurrences count tokens once") {
    // "p q r s t" x3 back-to-back: every token covered by a duplicated
    // 5-gram AND by a duplicated 10-gram (positions 0 and 5 share the
    // same 10-gram string) -> both exactly 1.0, never >1.
    val r = ngramRow("p q r s t p q r s t p q r s t")
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("partial dup coverage counts only covered token chars") {
    // "x y z w v x y z w v AAAA BBBB": the 5-gram "x y z w v" repeats
    // (10 tokens of 1 char covered); AAAA BBBB (8 chars) uncovered.
    // tot = 10 + 8 = 18 -> 10/18 = 0.5556.
    val r = ngramRow("x y z w v x y z w v AAAA BBBB")
    assert(r.getDouble(3) == 0.5556)
    assert(r.getDouble(4) == 0.0) // no repeated 10-gram
  }

  test("docs shorter than n score 0.0 (no fabricated grams)") {
    val r = ngramRow("a b c")
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0)
  }

  test("null text nulls every n-gram signal and DROPS (keep=false, not limbo)") {
    val out = QualitySignals.ngramCharSignals(
      Seq((1L, Option.empty[String])).toDF("id", "text"), "text")
    val r = out.head
    Seq("top_2_gram_char_frac", "dup_5_gram_char_frac").foreach { c =>
      assert(r.isNullAt(r.fieldIndex(c)), s"$c must be null for null text")
    }
    assert(!r.getAs[Boolean]("rep_keep"))
  }

  test("default dupNs is the FULL A1.1 set: a dup-6 violation drops that Seq(5,10) kept") {
    // A repeated 6-token span (single-char tokens, 12 covered chars)
    // in 23 distinct 3-char fillers: tot = 12 + 69 = 81, so dup_5 =
    // dup_6 = 12/81 = 0.1481 — UNDER the dup-5 gate (0.15), OVER the
    // dup-6 gate (0.14). The r11 Seq(5, 10) default never evaluated
    // the dup-6 rule and kept this doc.
    val span = "a b c d e f"
    val fillers = (1 to 23).map(i => f"f$i%02d").mkString(" ")
    val df = Seq((1L, s"$span $fillers $span")).toDF("id", "text")
    val full = QualitySignals.ngramCharSignals(df, "text").head
    assert(full.getAs[Double]("dup_5_gram_char_frac") == 0.1481)
    assert(full.getAs[Double]("dup_6_gram_char_frac") == 0.1481)
    assert(full.getAs[Double]("dup_10_gram_char_frac") == 0.0)
    assert(!full.getAs[Boolean]("rep_keep"),
      "full A1.1 defaults must evaluate the dup-6 rule")
    val narrowed = QualitySignals.ngramCharSignals(df, "text",
      dupNs = Seq(5, 10)).head
    assert(narrowed.getAs[Boolean]("rep_keep"),
      "the explicit narrow set keeps it — the widened default is load-bearing")
  }

  test("output-column collision is rejected resolver-aware") {
    val df = Seq((1L, "a b", 0.5)).toDF("id", "text", "REP_KEEP")
    val e = intercept[IllegalArgumentException] {
      QualitySignals.ngramCharSignals(df, "text")
    }
    assert(e.getMessage.contains("rep_keep"))
  }

  test("unknown n without a Gopher threshold is rejected loudly") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      QualitySignals.ngramCharSignals(df, "text", topNs = Seq(7))
    }
    intercept[IllegalArgumentException] {
      QualitySignals.ngramCharSignals(df, "text", dupNs = Seq(2))
    }
  }

  test("internal __rep_sig column and duplicate n sizes are rejected") {
    val df = Seq((1L, "a b", "x")).toDF("id", "text", "__rep_sig")
    val e = intercept[IllegalArgumentException] {
      QualitySignals.ngramCharSignals(df, "text")
    }
    assert(e.getMessage.contains("__rep_sig"))
    intercept[IllegalArgumentException] {
      QualitySignals.ngramCharSignals(
        Seq((1L, "a b")).toDF("id", "text"), "text", topNs = Seq(2, 2))
    }
  }

  test("signals() runs exactly ONE stats kernel pass in the optimized plan") {
    // Embedding a copy of the tokenSignals tree per withColumn relied
    // on whole-stage-codegen subexpression elimination: under
    // interpreted/codegen-disabled regimes the kernel evaluated 4x per
    // row (r13 ADVICE). signals() now materializes the struct as an
    // aliased column first — CollapseProject must NOT inline the
    // non-cheap alias back into its four consumers, over a REAL scan
    // (Seq-backed relations can fold differently).
    val dir = java.nio.file.Files.createTempDirectory("qsig_plan").toString
    Seq((1L, "a b a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = QualitySignals.signals(spark.read.parquet(dir), "text")
      .queryExecution.optimizedPlan.toString
    val kernels = plan.split("graft_token_stats").length - 1
    assert(kernels == 1, s"expected one graft_token_stats in:\n$plan")
    // and the internal temp column never leaks into the output schema
    assert(!QualitySignals.signals(spark.read.parquet(dir), "text")
      .columns.exists(_.startsWith("__graft")))
    // a user column of the temp's name would be silently replaced then
    // dropped — rejected up front, like ngramCharSignals' __rep_sig
    val e = intercept[IllegalArgumentException] {
      QualitySignals.signals(
        Seq((1L, "a", "x")).toDF("id", "text", "__graft_token_signals"), "text")
    }
    assert(e.getMessage.contains("__graft_token_signals"))
  }
}
