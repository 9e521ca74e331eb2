package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of any text
  * pipeline (crawled corpora mix precomposed and combining-mark forms
  * of the same grapheme, which breaks exact dedup, shingling, and
  * tokenizer training). Spark has no built-in normalizer; this is a
  * native codegen expression over `java.text.Normalizer`, so it stays
  * inside whole-stage codegen next to the other scan-stage text ops
  * (no UDF boxing) and matches DuckDB's `nfc_normalize` (both sides
  * implement the same Unicode canonical composition).
  *
  * Fast path: `isNormalized` is a cheap scan (quick-check property per
  * code point) and true for virtually all real text — ASCII and
  * already-composed corpora pay no allocation at all; only rows that
  * actually need recomposition take the normalize+copy hit.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $a.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.NFC)
         |  ? $a
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
