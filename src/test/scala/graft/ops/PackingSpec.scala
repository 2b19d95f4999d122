package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0L until 100L).map(i => (i, (i * 7 % 23) + 1)) // 1..23 tokens
  private val df = rows.toDF("id", "toks")

  test("two-phase packing equals the naive global-window cumsum") {
    val naive = df.withColumn("ce", coalesce(sum("toks").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), floor(col("ce") / 50).cast("long").as("seq_id"),
        (col("ce") % 50).cast("long").as("seq_offset"))
      .collect().map(_.toSeq).toSet
    // bucketWidth 7 forces many buckets (15 of ~7 rows): the offsets path
    // must stitch them together exactly
    val packed = Packing.packSequences(df, "id", "toks", capacity = 50, bucketWidth = 7)
      .select("id", "seq_id", "seq_offset").collect().map(_.toSeq).toSet
    assert(packed == naive)
  }

  test("packing invariants: offsets within capacity, seq ids monotone in id order") {
    val out = Packing.packSequences(df, "id", "toks", capacity = 64, bucketWidth = 10)
      .orderBy("id")
      .select("id", "toks", "cum_tokens_excl", "seq_id", "seq_offset").collect()
    assert(out.forall(r => r.getAs[Long]("seq_offset") >= 0 &&
      r.getAs[Long]("seq_offset") < 64))
    val seqIds = out.map(_.getAs[Long]("seq_id"))
    assert(seqIds.zip(seqIds.tail).forall { case (a, b) => a <= b })
    // total tokens before row k == sum of tokens of rows 0..k-1
    val toks = out.map(_.getAs[Long]("toks"))
    val cum = out.map(_.getAs[Long]("cum_tokens_excl"))
    assert(cum.head == 0L)
    assert(cum.toSeq == toks.scanLeft(0L)(_ + _).init.toSeq)
  }

  test("non-long-castable ids raise instead of vanishing through the bucket join") {
    val bad = Seq(("doc-1", 5L), ("doc-2", 7L)).toDF("id", "toks")
    val ex = intercept[Exception] {
      Packing.packSequences(bad, "id", "toks", capacity = 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("not castable to long")))
  }

  test("numeric-string ids order numerically, matching their buckets") {
    // Lexicographically "10" < "9" but the packing order is the CAST
    // long order (9 before 10) — the same domain the buckets live on.
    val sdf = Seq(("9", 4L), ("10", 6L), ("100", 2L)).toDF("id", "toks")
    val out = Packing.packSequences(sdf, "id", "toks", capacity = 64, bucketWidth = 16)
      .select("id", "cum_tokens_excl").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("9" -> 0L, "10" -> 4L, "100" -> 10L))
  }

  test("null/negative token counts clamp to 0: the cumsum stays monotone, seq ids never negative") {
    // A null count (size(null) = -1 upstream hazard) and an outright -5
    // must contribute 0 tokens, not drag the exclusive cumsum backwards
    // (one -1 put a row in seq_id -1 and shifted every later offset).
    val dirty = Seq((0L, Some(10L)), (1L, None), (2L, Some(-5L)), (3L, Some(7L)))
      .toDF("id", "toks")
    val out = Packing.packSequences(dirty, "id", "toks", capacity = 8)
      .orderBy("id").select("id", "cum_tokens_excl", "seq_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 10L, 10L, 10L))
    assert(out.forall(_.getLong(2) >= 0L))
    // null ids are DROPPED (documented), never a phantom bucket
    val withNullId = Seq((Some(0L), 5L), (None, 7L), (Some(2L), 3L))
      .toDF("id", "toks")
    val kept = Packing.packSequences(withNullId, "id", "toks", capacity = 8)
      .select("id", "cum_tokens_excl").orderBy("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(0L, 2L))
    assert(kept.map(_.getLong(1)).toSeq == Seq(0L, 5L)) // null row contributed nothing
  }

  test("non-castable token counts raise; nulls still clamp to 0") {
    // A wrong tokensCol (e.g. the text column passed by mistake) used
    // to cast->null->clamp-to-0 and silently pack the whole corpus
    // into seq_id 0; now it raises like the id screen, while genuine
    // nulls keep the documented clamp-to-0 contract (previous test).
    val wrongCol = Seq((0L, "ten"), (1L, "seven")).toDF("id", "toks")
    val ex = intercept[Exception] {
      Packing.packSequences(wrongCol, "id", "toks", capacity = 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("token count in 'toks' is not castable")),
      msgs(ex).mkString("|"))
    // Numeric STRINGS are fine — the contract is castability, not type.
    val strToks = Seq((0L, "10"), (1L, "7")).toDF("id", "toks")
    val out = Packing.packSequences(strToks, "id", "toks", capacity = 64)
      .orderBy("id").select("cum_tokens_excl").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 10L))
  }

  test("a document larger than capacity still starts in its own sequence (spillover)") {
    val big = Seq((0L, 10L), (1L, 300L), (2L, 10L)).toDF("id", "toks")
    val out = Packing.packSequences(big, "id", "toks", capacity = 100)
      .orderBy("id").select("seq_id", "seq_offset").collect()
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 0L)
    assert(out(1).getLong(0) == 0L && out(1).getLong(1) == 10L) // starts in seq 0
    assert(out(2).getLong(0) == 3L) // 310 tokens precede -> seq 3
  }
}
