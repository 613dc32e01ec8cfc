package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** `cosine_sim_q8(query, cand_q8, cand_scale)`: cosine similarity of a
  * full-precision query vector against a symmetric-int8-quantized
  * candidate (`q8[i] · scale ≈ original[i]`) — the scoring kernel for
  * quantized vector search, where candidate storage shrinks 4× (int8
  * vs float32), which at 100 TB is the difference between an in-memory
  * and a spilling candidate scan.
  *
  * One fused loop with no dequantized copy: `scale` factors out of the
  * dot product and the candidate norm, so the loop is integer loads +
  * one multiply-accumulate per dimension. Exactly equals
  * `cosine_sim(query, transform(q8, x -> x * scale))` (scale cancels in
  * the cosine ratio, so the result is also scale-independent for
  * scale > 0). Mismatched lengths use the common prefix; zero vectors
  * yield NaN (callers filter).
  */
case class CosineSimQ8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = second.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    val sOk = third.dataType == FloatType || third.dataType == DoubleType
    if (qOk && cOk && sOk) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_q8 expects (array<float|double>, array<byte>, float|double), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }
  }

  private lazy val queryIsFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val scaleIsFloat = third.dataType == FloatType

  override def nullSafeEval(q: Any, c: Any, s: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val scale = if (scaleIsFloat) s.asInstanceOf[Float].toDouble
                else s.asInstanceOf[Double]
    CosineSimQ8.compute(qa, ca, scale, queryIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, s) => {
      val scale = ctx.freshName("scale")
      s"""
         |double $scale = (double) $s;
         |${ev.value} = graft.functions.CosineSimQ8.compute($q, $c, $scale, $queryIsFloat);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CosineSimQ8 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CosineSimQ8 {

  /** Shared by interpreted eval and generated code. The scale cancels
    * out of the final ratio; it is applied anyway so the intermediate
    * magnitudes match the float path bit-for-bit when callers compare. */
  def compute(q: ArrayData, c: ArrayData, scale: Double, queryIsFloat: Boolean): Double = {
    val n = math.min(q.numElements(), c.numElements())
    var dot = 0d; var nq = 0d; var nc = 0d
    var i = 0
    while (i < n) {
      val qv = if (queryIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val cv = c.getByte(i) * scale
      dot += qv * cv; nq += qv * qv; nc += cv * cv
      i += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  def cosineSimQ8(query: Column, candQ8: Column, scale: Column): Column =
    ColumnBridge.column(CosineSimQ8(
      ColumnBridge.expression(query),
      ColumnBridge.expression(candQ8),
      ColumnBridge.expression(scale)))
}
