package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native expressions, injected via the
  * standard `SparkSessionExtensions` mechanism — `spark.sql(...)`
  * users (and the typed-CSV CLI) get `vec_dot`, `simhash64`, and
  * `minhash_sig` as first-class functions, planned and codegen'd
  * exactly like built-ins.
  *
  * Wire up with `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (done by [[graft.GraftSession]]) or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` on a
  * cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorExpressions.type].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        VectorExpressions.VecDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash64 expects 1 argument, got ${args.length}")
        VectorExpressions.SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_wide"),
      info("simhash_wide",
        "simhash_wide(tokens, words) - words x 64-bit SimHash of a string array, as array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"simhash_wide expects 2 arguments, got ${args.length}")
        val words = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"simhash_wide words must be an integer literal, got $other")
        }
        VectorExpressions.SimHashWide(args.head, words)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(tokens, nPerms) - nPerms-permutation MinHash signature of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"minhash_sig expects 2 arguments, got ${args.length}")
        val nPerms = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"minhash_sig nPerms must be an integer literal, got $other")
        }
        VectorExpressions.MinHashSig(args.head, nPerms)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      info("simhash_md5",
        "simhash_md5(tokens) - engine-portable 60-bit md5 SimHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash_md5 expects 1 argument, got ${args.length}")
        VectorExpressions.SimHashMd5(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_md5"),
      info("minhash_sig_md5",
        "minhash_sig_md5(tokens, nPerms) - engine-portable md5/Kirsch-Mitzenmacher MinHash signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"minhash_sig_md5 expects 2 arguments, got ${args.length}")
        val nPerms = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"minhash_sig_md5 nPerms must be an integer literal, got $other")
        }
        VectorExpressions.MinHashSigMd5(args.head, nPerms)
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(col, k) - k-counter Misra-Gries heavy-hitter sketch, as map<string,bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"misra_gries expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"misra_gries k must be an integer literal, got $other")
        }
        MisraGries(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("mode_count"),
      info("mode_count",
        "mode_count(arr) - multiplicity of the most frequent element of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"mode_count expects 1 argument, got ${args.length}")
        VectorExpressions.ModeCount(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("gated_vec_dot"),
      info("gated_vec_dot",
        "gated_vec_dot(a, b, bound[, prefix]) - vec_dot that returns NULL unless the " +
          "prefix-dot reaches bound (lossless Cauchy-Schwarz prune for threshold joins)"),
      (args: Seq[Expression]) => {
        require(args.length == 3 || args.length == 4,
          s"gated_vec_dot expects 3 or 4 arguments, got ${args.length}")
        val prefix = if (args.length == 3) 16 else args(3) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"gated_vec_dot prefix must be an integer literal, got $other")
        }
        VectorExpressions.GatedVecDot(args.head, args(1), args(2), prefix)
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      info("pq_adc",
        "pq_adc(codes, lut, k) - asymmetric PQ distance: sum of lut[s*k + codes[s]] " +
          "over the m code bytes, against a per-query codeword dot table"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"pq_adc expects 3 arguments, got ${args.length}")
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"pq_adc k must be an integer literal, got $other")
        }
        VectorExpressions.PqAdc(args.head, args(1), k)
      }))
  }
}
