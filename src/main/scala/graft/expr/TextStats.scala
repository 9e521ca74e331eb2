package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text statistics in ONE pass over the string:
  * (n_tokens, char_nws, punct_n, stop_hits) — exactly the quantities
  * TextAnalysis computes via 4-6 separate regex/higher-order
  * evaluations per row. Token/char classes replicate the composite
  * semantics bit-for-bit (`\s` = Java regex whitespace; `split` on an
  * all-whitespace string yields one empty token; punct =
  * `[^A-Za-z0-9\s]`), so the two paths are interchangeable — the
  * equivalence is spec-asserted on real data.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("char_nws", LongType, nullable = false),
    StructField("punct_n", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override protected def nullSafeEval(v: Any): Any =
    TextStatsKernel.compute(v.asInstanceOf[UTF8String].toString, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TextStatsKernel$$.MODULE$$.compute($a.toString(), $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsKernel {

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(s: String, stop: java.util.HashSet[String]): InternalRow = {
    var nTokens = 0L
    var charNws = 0L
    var punct = 0L
    var stopHits = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (sb.length > 0) {
          nTokens += 1
          if (stop.contains(sb.toString.toLowerCase(java.util.Locale.ROOT))) stopHits += 1
          sb.setLength(0)
        }
      } else {
        charNws += 1
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')
        if (!alnum) punct += 1
        sb.append(c)
      }
      i += 1
    }
    if (sb.length > 0) {
      nTokens += 1
      if (stop.contains(sb.toString.toLowerCase(java.util.Locale.ROOT))) stopHits += 1
    }
    // split of an empty/all-ws (trimmed) string yields one empty token
    if (nTokens == 0) nTokens = 1
    new GenericInternalRow(Array[Any](nTokens, charNws, punct, stopHits))
  }
}
