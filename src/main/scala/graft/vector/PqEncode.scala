package graft.vector

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encoder as a native Catalyst expression: one
  * pass over the float vector emits the m-byte PQ code (array<int>,
  * one codebook index per subspace). The per-subspace argmin is the
  * NearestCell kernel restricted to a dimension window — squared L2
  * accumulated in doubles in index order, first-wins on ties (smaller
  * code id), so any engine replaying the same codebooks reproduces the
  * codes bit-for-bit (the q87 determinism discipline).
  *
  * A UDF here would deserialize every embedding into a boxed
  * Seq[Float] per row; this walks the unsafe array directly inside
  * whole-stage codegen with the codebooks attached as a codegen
  * reference object (shipped once per executor with the plan).
  *
  * `codebooks(s)(c)(j)`: subspace s ∈ [0,m), code c ∈ [0,k), local
  * dimension j ∈ [0,dsub). A vector shorter than (s+1)·dsub compares
  * only its available dimensions (the NearestCell truncation guard —
  * an embedder change must degrade, not throw). Null input → null.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks != null && codebooks.nonEmpty, "PqEncode: no codebooks")
  require(codebooks.forall(_.nonEmpty), "PqEncode: empty codebook")

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
      s"${ev.value} = graft.vector.PqEncode$$.MODULE$$.encode($a, $cbRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {

  /** Static kernel shared by interpreted eval and generated code. */
  def encode(v: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val len = v.numElements()
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = cbs(s)
      val dsub = cb(0).length
      val n = math.min(dsub, math.max(0, len - off))
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < n) {
          val t = v.getFloat(off + j).toDouble - cent(j).toDouble
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    new GenericArrayData(codes)
  }
}
