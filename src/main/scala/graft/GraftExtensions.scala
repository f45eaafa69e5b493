package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotProduct, Fnv1a32Expr, WordNgramsExpr}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * expressions available as SQL functions in any session, the standard
  * installation path for a Spark extension library:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT fnv1a32(key), array_dot_product(a, b), word_ngrams(toks, 3)
  *
  * (Column-API callers use graft.functions directly; this registration is
  * for SQL/JDBC/notebook surfaces.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(s"graft.functions", name)

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv1a32"),
      info("fnv1a32", "fnv1a32(str) - FNV-1a 32-bit hash, sign-masked (reference ihash)"),
      (args: Seq[Expression]) => { arity("fnv1a32", args, 1); Fnv1a32Expr(args.head) }))
    ext.injectFunction((
      FunctionIdentifier("array_dot_product"),
      info("array_dot_product", "array_dot_product(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => {
        arity("array_dot_product", args, 2); ArrayDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(tokens, n) - space-joined sliding n-grams; n must be a literal"),
      (args: Seq[Expression]) => {
        arity("word_ngrams", args, 2)
        val n = args(1).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"word_ngrams: n must be an integer literal, got $other")
        }
        WordNgramsExpr(args(0), n)
      }))
  }
}
