package graft

import graft.functions.{DotProductExpr, FirstOccurrencesExpr, MinHashSignatureExpr, SimHash64Expr, WordShinglesExpr}
import graft.operators.UncoveredTokensExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration: exposes the engine's native
  * Catalyst expressions to SQL, so `spark.sql("SELECT graft_minhash(...)")`
  * works anywhere the library's jars are on the session classpath:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  *  - graft_shingles(tokens, k)       → array<string>
  *  - graft_minhash(shingles, k)      → array<bigint>
  *  - graft_simhash(tokens)           → bigint
  *  - graft_dot(vec_a, vec_b)         → double
  *  - graft_first_occurrences(arr)    → array<string> (order-preserving dedup)
  *  - graft_uncovered_tokens(tokens, starts, k) → array<string> (dup-span cut)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        WordShinglesExpr(args.head, intLit(args(1), "graft_shingles k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        MinHashSignatureExpr(args.head, intLit(args(1), "graft_minhash k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_first_occurrences"),
      new ExpressionInfo(classOf[FirstOccurrencesExpr].getName, "graft_first_occurrences"),
      (args: Seq[Expression]) => FirstOccurrencesExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_uncovered_tokens"),
      new ExpressionInfo(classOf[UncoveredTokensExpr].getName, "graft_uncovered_tokens"),
      (args: Seq[Expression]) =>
        UncoveredTokensExpr(args.head, args(1),
          intLit(args(2), "graft_uncovered_tokens k"))))
  }
}
