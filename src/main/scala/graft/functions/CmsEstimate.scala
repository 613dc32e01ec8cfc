package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)`: point-frequency lookup in a serialized
  * [[org.apache.spark.util.sketch.CountMinSketch]] — the read side of
  * Spark's built-in `count_min_sketch` aggregate, which Spark ships
  * without a SQL-facing probe. Together they complete the mergeable
  * sketch family (HLL cardinality q46, Space-Saving top-k q47, KLL
  * quantiles q50, bloom membership q53, CMS point frequency q56): the
  * materialize-once idiom where per-shard sketches are tiny, merge
  * associatively, and answer queries without rescanning raw data.
  *
  * Estimate contract (CMS): `true ≤ estimate ≤ true + eps·N` with
  * probability ≥ confidence — never an undercount. Items hash exactly
  * as the aggregate wrote them (UTF8String bytes), so probe and build
  * agree byte-for-byte.
  *
  * Intended shape: probing the (group-count-sized) aggregate output —
  * a handful of sketch rows fanned out against probe terms. The
  * deserialization is reference-memoized per thread because the fan-out
  * evaluates consecutive rows against the same sketch bytes; it is NOT
  * meant in a per-source-row hot loop (probe the aggregate, not the
  * corpus).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsEstimate.estimate(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sk, it) => s"graft.functions.CmsEstimate.estimate($sk, $it)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {

  // 1-entry per-thread deserialization cache: the probe fan-out
  // evaluates runs of rows against the same sketch bytes. Keyed by
  // CONTENT (Arrays.equals — O(sketch) but far cheaper than readFrom's
  // parse + grid allocation), with a reference fast path: binary values
  // read from UnsafeRows are typically fresh per-row copies, so a
  // reference-only key would never hit on the common scan shape. A miss
  // just re-parses — correctness never depends on a hit. Held through a
  // SoftReference so a long-lived executor thread doesn't pin the last
  // ~1/eps-sized sketch grid after the probing query finishes.
  private val last =
    new ThreadLocal[java.lang.ref.SoftReference[(Array[Byte], CountMinSketch)]]

  /** Deserializations performed (test observability: FunctionsSpec
    * asserts the probe fan-out parses ≪ once per row, i.e. the
    * content-keyed cache actually hits on UnsafeRow-copied binaries). */
  private[graft] val parseCount = new java.util.concurrent.atomic.LongAdder

  def estimate(sk: Array[Byte], item: UTF8String): Long = {
    val cached = Option(last.get()).map(_.get).orNull
    val cms =
      if (cached != null &&
          ((cached._1 eq sk) || java.util.Arrays.equals(cached._1, sk))) cached._2
      else {
        parseCount.increment()
        val parsed = CountMinSketch.readFrom(sk)
        last.set(new java.lang.ref.SoftReference((sk, parsed)))
        parsed
      }
    // byte[] routes to the same binary hash path CountMinSketchAgg
    // uses for UTF8String inputs
    cms.estimateCount(item.getBytes)
  }

  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
