package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.RollingHash
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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_sim", classOf[CosineSimilarity],
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(fn("rolling_hash", classOf[RollingHash],
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
  }
}
