package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `srp_sig(vec, nWords)`: sign-random-projection (hyperplane) LSH
  * signature of a numeric-array embedding — `nWords` 64-bit words, bit
  * `j` of word `w` = sign of the dot product of the vector with a
  * pseudo-random Rademacher (±1) hyperplane.
  *
  * Charikar's SRP: P[bit(a) = bit(b)] = 1 − angle(a,b)/π, so Hamming
  * distance over the signature estimates cosine similarity and banded
  * equality joins over signature slices generate near-dup candidates
  * without a cartesian product (see
  * [[graft.ops.Similarity.srpNearDupPairs]]).
  *
  * One xxhash64 per (word, dimension) supplies 64 plane signs at once
  * (its bits), so cost is dim × nWords hashes + dim × 64 × nWords adds
  * per row — a fused loop in generated Java, no per-row allocation
  * beyond the output word array. Deterministic across runs/engines.
  *
  * Null elements are skipped; a null array yields null.
  */
case class SrpSig(child: Expression, nWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_sig expects array<float> or array<double>, got ${other.simpleString}")
    }

  private lazy val childIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpSig.ofVector(input.asInstanceOf[ArrayData], nWords, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SrpSig.ofVector($a, $nWords, $childIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

object SrpSig {

  val Seed = 77L

  /** Shared by interpreted eval and generated code. */
  def ofVector(arr: ArrayData, nWords: Int, isFloat: Boolean): ArrayData = {
    val dim = arr.numElements()
    val out = new Array[Long](nWords)
    val acc = new Array[Double](64)
    var w = 0
    while (w < nWords) {
      java.util.Arrays.fill(acc, 0d)
      var d = 0
      while (d < dim) {
        if (!arr.isNullAt(d)) {
          val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          val h = XXH64.hashLong(d.toLong, Seed + w)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) acc(j) += v else acc(j) -= v
            j += 1
          }
        }
        d += 1
      }
      var word = 0L
      var j = 0
      while (j < 64) { if (acc(j) > 0) word |= 1L << j; j += 1 }
      out(w) = word
      w += 1
    }
    new GenericArrayData(out)
  }

  def srpSig(vec: Column, nWords: Int): Column =
    ColumnBridge.column(SrpSig(ColumnBridge.expression(vec), nWords))
}
