package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{NfcNormalize, RollingHash}
import graft.vector.CosineSimilarity

/** Session-extension entry point: registers the engine's native
  * expressions for SQL use —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  * spark.sql("SELECT rolling_hash(text) ...")
  * }}}
  *
  * No custom planner rules are injected: every reference operator is
  * expressible in Catalyst's existing algebra (SURVEY §4.3), so the
  * optimizer surface stays stock — extensions add functions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], builder: FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name), builder)

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): FunctionBuilder =
    exprs => {
      if (exprs.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> exprs.length.toString, "legacyNum" -> n.toString))
      build(exprs)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_sim", classOf[CosineSimilarity],
      arity("cosine_sim", 2)(e => CosineSimilarity(e(0), e(1)))))
    ext.injectFunction(fn("rolling_hash", classOf[RollingHash],
      arity("rolling_hash", 1)(e => RollingHash(e.head))))
    ext.injectFunction(fn("nfc_normalize", classOf[NfcNormalize],
      arity("nfc_normalize", 1)(e => NfcNormalize(e.head))))
  }
}
