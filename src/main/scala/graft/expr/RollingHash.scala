package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (training-data
  * pipeline: cheap shift-stable content ids, the streaming analog of
  * sha16). h = fold over code points: h*base + cp (mod m), seeded with
  * the first code point — exactly DuckDB's
  * `list_reduce(list_transform(string_split(s,''), c -> unicode(c)), …)`
  * so it stays oracle-checkable. Empty string → null.
  *
  * Native codegen keeps it inside whole-stage codegen next to the
  * normalization expressions (one pass, no UDF boxing). ASCII-exact;
  * multi-codepoint graphemes hash per code point here vs per grapheme
  * in DuckDB — document corpora should normalize first.
  */
case class RollingHash(child: Expression, base: Long = 257L,
    mod: Long = 1000000007L)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash"

  private def compute(s: String): Any = {
    if (s.isEmpty) return null
    var h = -1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = if (h < 0) cp % mod else (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val len = ctx.freshName("len")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $j = $a.toString();
         |int $len = $j.length();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $h = -1L; int $i = 0;
         |  while ($i < $len) {
         |    int $cp = $j.codePointAt($i);
         |    $h = ($h < 0L) ? ($cp % ${mod}L) : (($h * ${base}L + $cp) % ${mod}L);
         |    $i += java.lang.Character.charCount($cp);
         |  }
         |  ${ev.value} = $h;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
