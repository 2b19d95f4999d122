package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate the fused kernels") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("""
      SELECT graft_dot(a, b) AS d, round(graft_cosine(a, b), 6) AS c,
             graft_l2(a, b) AS l, size(graft_hash_embed('hello', 16)) AS e
      FROM vecs""").head
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[Double]("c") ==
      math.rint(32.0 / (math.sqrt(14) * math.sqrt(77)) * 1e6) / 1e6)
    assert(r.getAs[Double]("l") == math.sqrt(27))
    assert(r.getAs[Int]("e") == 16)
  }

  test("sql embed matches driver-side embedQuery") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_hash_embed('the quick fox', 32) AS v")
      .head.getSeq[Double](0)
    assert(viaSql == graft.embed.HashEmbedder(32).embedQuery("the quick fox").toSeq)
  }

  test("wrong arity yields a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0))").head)
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("graft_dot"))
  }

  test("SQL kernels coerce non-double arrays instead of misreading strides") {
    GraftExtensions.register(spark)
    // Pre-fix the kernels declared no input types: array<int> children
    // passed analysis and getDouble read 8-byte strides over 4-byte
    // cells — silently wrong scores. The declared array<double> inputs
    // make analysis insert the cast (same coercion the DataFrame
    // surface applies via asDouble).
    val r = spark.sql(
      "SELECT graft_dot(array(1, 2), array(3, 4)) AS d").head
    assert(r.getAs[Double]("d") == 11.0)
    // scalar inputs fail ANALYSIS, not mid-task with a ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(1, 2)").head
    }
  }

  test("graft_hash_embed rejects a non-positive dim at analysis, not per row") {
    GraftExtensions.register(spark)
    // The SQL route bypasses HashEmbedder's constructor check; without
    // the expression-level guard dim=-1 passed analysis and threw
    // NegativeArraySizeException inside every task (dim=0 silently
    // returned empty vectors as embeddings).
    val neg = intercept[Exception](
      spark.sql("SELECT graft_hash_embed('x', -1)").head)
    assert(neg.getMessage.contains("positive"))
    val zero = intercept[Exception](
      spark.sql("SELECT graft_hash_embed('x', 0)").head)
    assert(zero.getMessage.contains("positive"))
  }

  test("graft_ngram_repetition from SQL matches the DataFrame gate's masses") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_ngram_repetition('a b a b a b c') AS m").head.getStruct(0)
    // 7 token chars; "a b" x3 -> 6; "a b a" x2 -> 6; "a b a b" x2 -> 8;
    // no repeated 5-/10-gram.
    assert(r.getAs[Long]("tot_chars") == 7L)
    assert(r.getAs[Long]("top_mass_2") == 6L)
    assert(r.getAs[Long]("top_mass_3") == 6L)
    assert(r.getAs[Long]("top_mass_4") == 8L)
    assert(r.getAs[Long]("dup_mass_5") == 0L)
    assert(r.getAs[Long]("dup_mass_10") == 0L)
    // null text -> null struct (the gate's null contract end-to-end)
    assert(spark.sql(
      "SELECT graft_ngram_repetition(CAST(NULL AS STRING)) AS m").head.isNullAt(0))
  }
}
