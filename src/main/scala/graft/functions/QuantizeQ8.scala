package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `quantize_q8(embedding)`: symmetric int8 quantization of a float
  * vector in ONE fused pass — returns `struct(q_scale float, q8
  * array<byte>)` with scale = max|x|/127 and q8[i] = round(x[i]/scale)
  * (all-zero bytes with scale 0 for zero/empty vectors).
  *
  * Replaces the two-HOF formulation (`aggregate` for the max, a
  * `transform` for the bytes): higher-order functions are
  * `CodegenFallback`, so one of them in a projection knocks the whole
  * stage out of whole-stage codegen and the scoring tree re-evaluates
  * interpreted — the measured 13× cliff this library's other custom
  * expressions exist to avoid. Quantization runs once per corpus row on
  * the d05/s03 index-build path, which at 10⁹ rows is exactly where an
  * interpreted stage would bite. Output is spec-asserted bit-identical
  * to the HOF formulation on well-formed (finite, non-null-element)
  * vectors; degenerate-input behavior is documented on [[compute]].
  */
case class QuantizeQ8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeQ8.OutputType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_q8 expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    QuantizeQ8.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeQ8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeQ8 =
    copy(child = newChild)
}

object QuantizeQ8 {

  // q_scale is DOUBLE for bit-parity with the HOF formulation this
  // replaced (float aggregate / float literal promotes to double in
  // Spark arithmetic) — downstream CosineSimQ8 accepts either width
  val OutputType: DataType = StructType(Seq(
    StructField("q_scale", DoubleType, nullable = false),
    StructField("q8", ArrayType(ByteType, containsNull = false), nullable = false)))

  /** Shared by interpreted eval and generated code: one pass for the
    * max-abs, one for the bytes — no boxed intermediates. Arithmetic
    * mirrors the HOF path: float max-abs, double scale, double
    * division, away-from-zero half rounding (agrees with Spark's
    * round() everywhere except quotients within half an ulp of an
    * exact .5 — absent on real data and covered by the bit-parity
    * spec on the fixtures). Degenerate inputs: a NaN element poisons
    * the scale to NaN and the bytes to zero (the HOF behavior —
    * `greatest` treats NaN as largest); a NULL element counts as 0
    * (the one intentional divergence: the HOF emitted a null byte,
    * this emits 0 so `q8` stays null-free for the scoring kernel —
    * null elements only occur in malformed embeddings, which the
    * near-dup paths drop via cleanVectors anyway). */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0f
    var sawNaN = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getFloat(i)
        if (v.isNaN) sawNaN = true
        else {
          val a = math.abs(v)
          if (a > maxAbs) maxAbs = a
        }
      }
      i += 1
    }
    val scale = if (sawNaN) Double.NaN else maxAbs.toDouble / 127.0
    val bytes = new Array[Byte](n)
    if (scale > 0d) { // false for NaN and 0 → all-zero bytes
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getFloat(i).toDouble / scale
          val r = if (x >= 0) math.floor(x + 0.5d) else math.ceil(x - 0.5d)
          bytes(i) = r.toByte
        }
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(bytes))
  }

  def quantizeQ8(embedding: Column): Column =
    ColumnBridge.column(QuantizeQ8(ColumnBridge.expression(embedding)))
}
