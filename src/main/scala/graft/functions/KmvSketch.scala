package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `kmv_sketch(item, k)`: theta-style K-Minimum-Values distinct sketch
  * (Beyer et al. 2007; the KMV member of the theta-sketch family) as a
  * [[TypedImperativeAggregate]] — the SET-OPERATION member of the
  * mergeable-sketch suite (HLL counts q46, Space-Saving heavy hitters
  * q47, KLL quantiles q50, bloom membership q53, CMS point frequency
  * q56). HLL answers "how many distinct"; KMV additionally answers
  * "how many distinct IN COMMON" between two sketches built
  * independently — the cross-shard set-intersection question (shared
  * users across event types, document overlap across crawls) that
  * would otherwise need a full distinct-join of raw data.
  *
  * State: the k smallest distinct xxhash64 values (unsigned order) seen.
  * Estimation: hashing is uniform on [0, 2^64), so if the k-th smallest
  * value sits at fraction θ of the hash space, distinct ≈ (k−1)/θ.
  * Intersection: for sketches A, B with θ = min(θ_A, θ_B), every
  * common value below θ survives in BOTH sketches (each holds ALL its
  * hashes below its own θ), so |A∩B| ≈ |common below θ|/θ.
  *
  *  - `k ≥ |distinct|` on every input: the sketch holds EVERY hash
  *    (never trimmed, θ = 1) and both estimates are EXACT and
  *    deterministic — the regime the oracle-checked query (q61) runs
  *    in, 10× headroom at the bench scale.
  *  - `k < |distinct|`: classic approximate regime, relative error
  *    ~1/√k — error-gated in the spec, never oracle-compared.
  *
  * Merge = set union + trim to the k smallest: associative,
  * commutative, and ORDER-INDEPENDENT (a pure function of the input
  * value set), so partial aggregation over any partitioning yields
  * byte-identical sketches — stronger determinism than Space-Saving's
  * order-dependent approximate regime, and what makes the serialized
  * sketch itself safe to store and diff. Map-side sketches shuffle as
  * ≤ k-long byte arrays, never raw rows.
  */
case class KmvSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Summary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

  // both invariants surface as ANALYSIS errors (not construction-time
  // IllegalArgumentException), so SQL `kmv_sketch(v, 8)` fails the same
  // way `kmv_sketch(intCol, 64)` does
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a string item (cast explicitly), got " +
        child.dataType.simpleString)
    else if (k < 16) TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs k >= 16 for a usable estimator, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvSketch.Summary =
    new KmvSketch.Summary(k)

  override def update(buf: KmvSketch.Summary, input: InternalRow): KmvSketch.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.offer(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, KmvSketch.Seed))
    }
    buf
  }

  override def merge(buf: KmvSketch.Summary, other: KmvSketch.Summary): KmvSketch.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KmvSketch.Summary): Any = buf.toBytes

  override def serialize(buf: KmvSketch.Summary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvSketch.Summary =
    KmvSketch.Summary.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** `kmv_estimate(sketch)`: distinct-count estimate from a serialized
  * KMV sketch (exact when the sketch was never trimmed). */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmv_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate expects binary, got ${child.dataType.simpleString}")

  override def nullSafeEval(sk: Any): Any =
    KmvSketch.estimate(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sk => s"graft.functions.KmvSketch.estimate($sk)")

  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}

/** `kmv_intersect(a, b)`: estimated distinct-value intersection of two
  * KMV sketches (exact when neither was ever trimmed). */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmv_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_intersect expects (binary, binary), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KmvSketch.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

object KmvSketch {

  /** Fixed seed — same family as Spark's built-in `xxhash64`. */
  val Seed: Long = 42L

  /** Unsigned long → fraction of the 64-bit hash space, in [0, 1). */
  private def frac(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L)) / 1.8446744073709552e19 // 2^64

  /** Mutable k-smallest-distinct-hashes summary (unsigned order). */
  final class Summary(k: Int) {
    private[KmvSketch] val values =
      new java.util.TreeSet[java.lang.Long](
        (a: java.lang.Long, b: java.lang.Long) =>
          java.lang.Long.compareUnsigned(a, b))
    /** True once any value has been discarded: θ < 1 and estimates turn
      * approximate. While false the sketch holds EVERY distinct hash —
      * the exact regime (`size == k` untrimmed stays exact too, which
      * is why this is a flag and not `size == k`). */
    private[KmvSketch] var trimmed: Boolean = false

    def offer(h: Long): Unit = {
      // saturation fast path: once the sketch holds k values, the
      // overwhelming majority of further hashes exceed the current
      // k-th minimum — reject them with ONE comparison and no boxed
      // insert/remove round-trip (this is the per-row hot path of the
      // aggregate; h == last is a no-op either way: equal to an
      // already-kept value)
      if (values.size >= k &&
          java.lang.Long.compareUnsigned(h, values.last) >= 0) {
        if (java.lang.Long.compareUnsigned(h, values.last) > 0) trimmed = true
        return
      }
      values.add(h)
      if (values.size > k) { values.remove(values.last); trimmed = true }
      ()
    }

    def mergeIn(other: Summary): Unit = {
      other.values.forEach(v => offer(v))
      trimmed |= other.trimmed
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeBoolean(trimmed)
      out.writeInt(values.size)
      values.forEach(v => out.writeLong(v))
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte], k: Int): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val s = new Summary(k)
      s.trimmed = in.readBoolean()
      val n = in.readInt()
      var i = 0
      while (i < n) { s.values.add(in.readLong()); i += 1 }
      s
    }
  }

  private def parse(bytes: Array[Byte]): (Boolean, Array[Long]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val trimmed = in.readBoolean()
    val n = in.readInt()
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = in.readLong(); i += 1 } // unsigned-ascending
    (trimmed, vs)
  }

  def estimate(sk: Array[Byte]): Long = {
    val (trimmed, vs) = parse(sk)
    if (!trimmed) vs.length.toLong
    else math.round((vs.length - 1).toDouble / frac(vs(vs.length - 1)))
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Long = {
    val (ta, va) = parse(a)
    val (tb, vb) = parse(b)
    // θ of a sketch = 1 while untrimmed (it holds everything), else the
    // fraction of its largest kept hash; common values below min(θ_a,
    // θ_b) are guaranteed present in both sketches
    val theta = math.min(
      if (ta) frac(va(va.length - 1)) else 1.0,
      if (tb) frac(vb(vb.length - 1)) else 1.0)
    var i = 0; var j = 0; var common = 0L
    while (i < va.length && j < vb.length) {
      val c = java.lang.Long.compareUnsigned(va(i), vb(j))
      if (c == 0) {
        if (theta >= 1.0 || frac(va(i)) < theta) common += 1
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    if (theta >= 1.0) common else math.round(common / theta)
  }

  /** Column API: aggregate a string column into a serialized KMV
    * sketch of its distinct values. */
  def kmvSketch(item: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(item), k).toAggregateExpression())

  def kmvEstimate(sketch: Column): Column =
    ColumnBridge.column(KmvEstimate(ColumnBridge.expression(sketch)))

  def kmvIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(KmvIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
