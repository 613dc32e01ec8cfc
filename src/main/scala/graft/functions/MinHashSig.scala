package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(shingles, k)`: k-permutation MinHash signature of an
  * `array<string>` shingle set, as one fused Catalyst expression.
  *
  * Uses the two-hash construction from the MinHash literature
  * (h_i(s) = h1(s) + i·h2(s)): 2 xxhash64 evaluations per shingle instead
  * of k, then k fused min-updates — ~k/2× less hashing than the
  * `transform(sequence(0,k-1), i -> array_min(transform(...)))` HOF chain,
  * with no intermediate array allocations and no CodegenFallback nodes in
  * the aggregate path.
  *
  * Null shingles are skipped; an empty/all-null input yields a signature
  * of Long.MaxValue sentinels (no shingle observed).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.signature(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.signature($a, $k))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  val Seed1 = 42L
  val Seed2 = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  /** Single pass over the shingles: per shingle two xxh64 draws, then k
    * min-updates. */
  def signature(arr: ArrayData, k: Int): Array[Long] = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
        var j = 0
        var h = h1
        while (j < k) {
          if (h < sig(j)) sig(j) = h
          h += h2 // h1 + (j+1)*h2, fused
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
}
