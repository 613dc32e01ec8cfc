package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — the public algorithm):
  * the embedding splits into `m` equal subspaces, each encoded as the
  * index of its nearest sub-codebook centroid, so a D-dim float vector
  * (4·D bytes) stores as m bytes — 32× smaller at D=64, m=8, and 8×
  * smaller than even the int8 path. Search is ASYMMETRIC (ADC): the
  * full-precision query precomputes a lookup table of its dot product
  * with every sub-centroid, and a candidate's approximate dot product
  * is m table lookups — no per-candidate float math at all.
  *
  * Both kernels are codegen'd expressions (`doGenCode`), keeping the
  * encode pass and the O(corpus × queries) scoring scan inside
  * whole-stage codegen — the HOF formulation (`aggregate`/`zip_with`
  * chains) would fall back to interpreted eval on the hottest loop.
  */

/** `pq_encode(embedding, flatCodebook)`: struct of the m sub-codes of
  * a vector — for each subspace j, the index (0-based, tie to the
  * LOWEST index) of the L2-nearest sub-centroid — and `err`, the L2
  * norm of the reconstruction residual (√Σ_j bestDist_j). The residual
  * norm is what turns PQ from an approximation into a PRUNING BOUND
  * for exact search: by Cauchy–Schwarz, |dot(q, v) − adc(q, codes)| ≤
  * ‖q‖ · err, so a candidate whose upper bound falls below the k-th
  * best lower bound provably cannot be in the top-k. `flatCodebook` is
  * the literal concatenation of m·ks sub-centroids of subdim floats
  * each (`[j][c][dim]` order); m and ks ride as case-class parameters.
  * Vector length must equal m · subdim (enforced; a ragged split
  * would silently misalign every later lookup). */
case class PqEncode(left: Expression, right: Expression, m: Int, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false),
      nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val eOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = right.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (eOk && cOk && m >= 1 && ks >= 1 && ks <= 128) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double>, array<float>) with " +
        s"1 <= ks <= 128, got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}), m=$m, ks=$ks")
  }

  private lazy val embIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(e: Any, cb: Any): Any =
    PqCodes.encode(e.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, ks, embIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cb) =>
      s"${ev.value} = graft.functions.PqCodes.encode($e, $cb, $m, $ks, $embIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc(codes, lut)`: the ADC approximate dot product — for each
  * subspace j, look up `lut[j*ks + codes[j]]` and sum. `lut` is the
  * query's flattened m·ks table of sub-dot-products; ks is derived per
  * row as `lut.length / codes.length`, so one expression serves any
  * (m, ks) the caller encoded with. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val cOk = left.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    val lOk = right.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (cOk && lOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<byte>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private lazy val lutIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(c: Any, l: Any): Any =
    PqCodes.adc(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData], lutIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqCodes.adc($c, $l, $lutIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqCodes {

  /** Shared by interpreted eval and generated code. */
  def encode(emb: ArrayData, cb: ArrayData, m: Int, ks: Int,
             embIsFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val d = emb.numElements()
    require(d % m == 0 && cb.numElements() == (d / m) * m * ks,
      s"pq_encode: dim $d must split into m=$m subspaces and the " +
        s"codebook must hold m*ks*subdim floats (got ${cb.numElements()})")
    val sub = d / m
    val codes = new Array[Byte](m)
    var errSq = 0d
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var dist = 0d
        var i = 0
        while (i < sub) {
          val x = if (embIsFloat) emb.getFloat(j * sub + i).toDouble
                  else emb.getDouble(j * sub + i)
          val w = cb.getFloat((j * ks + c) * sub + i).toDouble
          val diff = x - w
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = c } // strict: tie -> lowest
        c += 1
      }
      codes(j) = best.toByte
      errSq += bestD
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), math.sqrt(errSq)))
  }

  def adc(codes: ArrayData, lut: ArrayData, lutIsFloat: Boolean): Double = {
    val m = codes.numElements()
    if (m == 0) return 0d
    // a LUT built for a different (m, ks) than the encoder's would
    // read shifted table cells and return plausible-but-wrong dots —
    // silently corrupting the "provably exact" bound; at least the
    // divisibility mismatch fails loudly (a same-size wrong LUT is
    // uncatchable here and owned by the caller pairing them)
    require(lut.numElements() % m == 0,
      s"pq_adc: lut length ${lut.numElements()} is not a multiple of " +
        s"m=$m code entries — codes and lut were built with different " +
        "PQ parameters")
    val ks = lut.numElements() / m
    var sum = 0d
    var j = 0
    while (j < m) {
      val idx = j * ks + (codes.getByte(j) & 0xff)
      sum += (if (lutIsFloat) lut.getFloat(idx).toDouble else lut.getDouble(idx))
      j += 1
    }
    sum
  }

  def pqEncode(embedding: Column, flatCodebook: Column, m: Int, ks: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(embedding),
      ColumnBridge.expression(flatCodebook), m, ks))

  def pqAdc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut)))
}
