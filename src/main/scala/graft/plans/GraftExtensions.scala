package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, DotProductExpr, DotProductInt8Expr,
  HashEmbedExpr, L2DistanceExpr, MinHashBandsExpr, MinHashSigExpr, ShinglesExpr}

/** SparkSessionExtensions installer: exposes the fused vector kernels
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works anywhere DataFrame code does — including pure-SQL frontends.
  *
  * Wire up either way:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)                       // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Opt-in ANN acceleration (inert until a store is registered AND
    // spark.graft.ivf.autoPrune=true — see IvfTopKPruneRule).
    ext.injectOptimizerRule(spark => IvfTopKPruneRule(spark))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.0", "", "internal")

  private def binary(name: String, usage: String,
                     f: (Expression, Expression) => Expression) = {
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      f(args(0), args(1))
    }
    (name, info(name, usage), builder)
  }

  /** Integer-literal argument extraction (the graft_hash_embed
    * pattern): kernel shape parameters (n-gram size, hash counts) are
    * plan-time constants of the expression, never per-row values. */
  private def intLit(name: String, arg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name $arg must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("graft_dot", "graft_dot(a, b) - dot product of two double arrays",
      DotProductExpr.apply),
    binary("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays",
      CosineSimilarityExpr.apply),
    binary("graft_l2", "graft_l2(a, b) - euclidean distance of two double arrays",
      L2DistanceExpr.apply),
    ("graft_hash_embed",
      info("graft_hash_embed", "graft_hash_embed(text, dim) - deterministic sha-seeded unit embedding"),
      { args: Seq[Expression] =>
        require(args.length == 2, s"graft_hash_embed expects (text, dim)")
        val dim = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hash_embed dim must be an integer literal, got $other")
        }
        HashEmbedExpr(args(0), dim)
      }),
    ("graft_ngram_repetition",
      info("graft_ngram_repetition",
        "graft_ngram_repetition(text) - Gopher repetition masses: " +
          "struct<tot_chars, top_mass_2/3/4, dup_mass_5..10> (token code-point " +
          "chars; fraction = mass / greatest(tot_chars, 1))"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"graft_ngram_repetition expects (text)")
        // Full A1.1 dup set, matching the DataFrame default (r12): a
        // SQL surface stuck on Seq(5, 10) would be the same silently
        // narrowed gate the default change closed.
        graft.functions.NgramRepetitionExpr(args(0), Seq(2, 3, 4), 5 to 10)
      }),
    // --- r12 additions: the dedup/search text kernels + Luhn ---------
    binary("graft_dot_int8",
      "graft_dot_int8(a, b) - dot product of two int8-quantized (tinyint array) vectors",
      DotProductInt8Expr.apply),
    ("graft_shingles",
      info("graft_shingles",
        "graft_shingles(text, n) - distinct word n-gram shingles, first-occurrence order"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_shingles expects (text, n)")
        ShinglesExpr(args(0), intLit("graft_shingles", "n", args(1)))
      }),
    ("graft_minhash_sig",
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, numHashes) - MinHash signature (array<bigint>) of a shingle array"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_minhash_sig expects (shingles, numHashes)")
        MinHashSigExpr(args(0), intLit("graft_minhash_sig", "numHashes", args(1)))
      }),
    ("graft_minhash_bands",
      info("graft_minhash_bands",
        "graft_minhash_bands(shingles, numHashes, bands) - LSH band keys " +
          "('b|v0|..'); equi-join on a key for near-dup candidates"),
      { args: Seq[Expression] =>
        require(args.length == 3,
          "graft_minhash_bands expects (shingles, numHashes, bands)")
        MinHashBandsExpr(args(0),
          intLit("graft_minhash_bands", "numHashes", args(1)),
          intLit("graft_minhash_bands", "bands", args(2)))
      }),
    // Column-composed functions (no dedicated Expression; the bridge
    // lowers the same built-in tree the Scala API produces, so SQL and
    // DataFrame callers are bit-identical by construction).
    ("graft_simhash63",
      info("graft_simhash63",
        "graft_simhash63(text) - 63-bit token-vote SimHash fingerprint (bigint)"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_simhash63 expects (text)")
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          graft.functions.TextFunctions.simhash63(
            org.apache.spark.sql.GraftSqlBridge.column(args(0))))
      }),
    ("graft_luhn_valid",
      info("graft_luhn_valid",
        "graft_luhn_valid(digits) - Luhn checksum over a digit run " +
          "(dashes/spaces stripped; anything else -> false, null -> null); " +
          "what separates a card number from an order id"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_luhn_valid expects (candidate)")
        // Pii.luhnValid's contract assumes a CcPattern-proposed
        // candidate; arbitrary SQL input needs the digit-run guard
        // HERE — unguarded, '' builds sequence(1, 0) (which DESCENDS)
        // and non-digits fail the ANSI cast mid-fold instead of
        // reading as "not a card". The guard is a CaseWhen BRANCH,
        // not an And conjunct: the optimizer may split/reorder And
        // conjuncts (predicate pushdown in a WHERE), letting the
        // fold's cast see non-digit input; CaseWhen branch order is
        // guaranteed. Null keeps null-in/null-out: a null candidate
        // falls through both branches to the null otherwise.
        val t = org.apache.spark.sql.GraftSqlBridge.column(args(0))
        val digits = org.apache.spark.sql.functions.translate(t, "- ", "")
        import org.apache.spark.sql.functions.{when, lit}
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          when(digits.rlike("^[0-9]+$"), graft.ops.Pii.luhnValid(t))
            .when(t.isNotNull, lit(false)))
      }),
    ("graft_pii_redact",
      info("graft_pii_redact",
        "graft_pii_redact(text) - emails, then phones, then IPv4 replaced " +
          "with <EMAIL>/<PHONE>/<IP> (the Pii.redactCol cascade)"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_pii_redact expects (text)")
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          graft.ops.Pii.redactCol(
            org.apache.spark.sql.GraftSqlBridge.column(args(0))))
      }),
    ("graft_cc_redact",
      info("graft_cc_redact",
        "graft_cc_redact(text) - Luhn-valid card candidates (grouping-" +
          "agnostic maximal digit runs) replaced with <CC>; invalid digit " +
          "runs survive"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_cc_redact expects (text)")
        val t = org.apache.spark.sql.GraftSqlBridge.column(args(0))
        org.apache.spark.sql.GraftSqlBridge.catalystExpression(
          org.apache.spark.sql.functions.aggregate(
            graft.ops.Pii.ccCandidatesCol(t), t,
            (acc, c) => org.apache.spark.sql.functions.replace(acc, c,
              org.apache.spark.sql.functions.lit("<CC>"))))
      })
  )

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
