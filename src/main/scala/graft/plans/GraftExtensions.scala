package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarityExpr, DotProductExpr, HashEmbedExpr, L2DistanceExpr}

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
          "struct<tot_chars, top_mass_2/3/4, dup_mass_5/10> (token code-point " +
          "chars; fraction = mass / greatest(tot_chars, 1))"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"graft_ngram_repetition expects (text)")
        graft.functions.NgramRepetitionExpr(args(0), Seq(2, 3, 4), Seq(5, 10))
      })
  )

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
