package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash(tokens)`: 64-bit SimHash fingerprint of an `array<string>` of
  * tokens, as a native Catalyst expression.
  *
  * Classic Charikar scheme: each token is hashed (xxhash64, seed 42 — the
  * same family as Spark's built-in `xxhash64`), each of the 64 hash bits
  * votes +1/-1, the sign of each counter becomes the output bit. Documents
  * with small edit distance get small Hamming distance, enabling
  * shuffle-light near-dup grouping: split the 64-bit fingerprint into k
  * bands and hash-join on band equality (see [[graft.ops.Dedup]]) — no
  * cartesian product at any scale.
  *
  * Null tokens are skipped; a null array yields null.
  */
case class SimHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // array<string> tokens enforced at ANALYSIS time, so SQL misuse
  // (`simhash('abc')`) is an AnalysisException, not an executor
  // ClassCastException — same contract as every other graft function
  override def checkInputDataTypes(): TypeCheckResult =
    SimHash.checkTokens(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash.ofTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash.ofTokens($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** `simhash_md5(tokens)`: the same Charikar voting scheme with the
  * per-token hash swapped for the first 64 bits (big-endian) of
  * MD5(token) — an ORACLE-EXPRESSIBLE twin: `md5` exists as a built-in
  * in both Spark and DuckDB, so the whole fingerprint (and therefore
  * the banded near-dup pair set) can be recomputed in SQL and
  * hash-checked, which the xxhash64-seeded [[SimHash]] cannot (DuckDB
  * has no xxhash64). Keep [[SimHash]] for production speed — one XXH64
  * pass per token vs a full MD5 — and this twin wherever cross-engine
  * verifiability matters more than throughput. */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    SimHash.checkTokens(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash.ofTokensMd5(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash.ofTokensMd5($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHash {

  val Seed = 42L

  private[functions] def checkTokens(fn: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<string> tokens, got ${other.simpleString}")
    }

  /** Single-pass SimHash over an ArrayData of UTF8Strings (shared by
    * interpreted eval and generated code). */
  def ofTokens(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Per-thread digest: MessageDigest is stateful and not thread-safe,
    * and getInstance per row would dominate the hash itself. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [[ofTokens]] with the token hash = first 8 bytes of MD5(token),
    * big-endian — i.e. the value DuckDB reconstructs from
    * `substr(md5(t), 1, 16)` hex digits (see the d04 oracle). */
  def ofTokensMd5(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = md5Local.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens)))

  def simhashMd5(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(tokens)))
}
