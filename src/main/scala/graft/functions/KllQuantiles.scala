package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `kll_quantile(v, qBp, capacity)`: mergeable quantile sketch
  * (KLL-style compactor levels) as a [[TypedImperativeAggregate]] —
  * the distribution member of the mergeable-sketch trio (HLL =
  * cardinality q46, Space-Saving = frequency q47, this = quantiles),
  * the pre-aggregation idiom that lets any rollup at 100 TB union
  * compact summaries instead of re-scanning raw data.
  *
  * Structure: level i holds values of weight 2^i, each level bounded by
  * `capacity`; an overfull level sorts, promotes every second value to
  * level i+1 (alternating start offset — no RNG), and clears. State is
  * O(capacity · log(n/capacity)) regardless of stream length; merge is
  * level-wise concatenation + re-compaction. In the approximate regime
  * the surviving values depend on the merge ORDER, which Spark's
  * shuffle does not fix across runs — like any compactor sketch, the
  * answer is reproducible per merge topology and bounded always; only
  * the EXACT regime (below) is run-for-run identical, which is why the
  * oracle lives there.
  *
  * Quantile semantics are LOWER-quantile by weighted rank with the
  * target rank in pure integer arithmetic: for q basis points (5000 =
  * p50) the target is ceil(W·q/10000) = (W·q + 9999) div 10000 —
  * engine-portable (no IEEE-vs-decimal `ceil(0.9*n)` mismatch between
  * the JVM and an oracle engine), which is what makes the exact regime
  * DuckDB-checkable.
  *
  *  - `capacity ≥ |group|`: no compaction ever runs — the sketch holds
  *    every value at weight 1 and the answer is the EXACT lower
  *    quantile (the oracle-checked regime).
  *  - `capacity < |group|`: compaction bounds state; the weighted-rank
  *    answer carries the standard compactor rank error (a few % of W
  *    at capacity 256 — measured and bounds-gated in the spec).
  */
case class KllQuantiles(
    child: Expression, quantilesBp: Seq[Int], capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllQuantiles.Summary] {

  require(capacity >= 2, s"capacity ($capacity) must be >= 2")
  require(quantilesBp.nonEmpty && quantilesBp.forall(q => q >= 1 && q <= 10000),
    s"quantiles must be basis points in [1, 10000], got $quantilesBp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects a double column (cast explicitly), got " +
          child.dataType.simpleString)
    }

  override def createAggregationBuffer(): KllQuantiles.Summary =
    new KllQuantiles.Summary(capacity)

  override def update(buf: KllQuantiles.Summary, input: InternalRow): KllQuantiles.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.update(d)
    }
    buf
  }

  override def merge(buf: KllQuantiles.Summary,
                     other: KllQuantiles.Summary): KllQuantiles.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllQuantiles.Summary): Any =
    new GenericArrayData(buf.quantiles(quantilesBp))

  override def serialize(buf: KllQuantiles.Summary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllQuantiles.Summary =
    KllQuantiles.Summary.fromBytes(bytes, capacity)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}

object KllQuantiles {

  /** Mutable compactor-level summary. */
  final class Summary(capacity: Int) {
    // levels(i): unsorted values of weight 2^i, each bounded by capacity
    private[KllQuantiles] val levels = ArrayBuffer(ArrayBuffer.empty[Double])
    private[KllQuantiles] var compactions = 0L

    def update(v: Double): Unit = {
      levels(0) += v
      if (levels(0).length > capacity) cascade(0)
    }

    /** Compact level i: sorted, every second value (alternating start
      * offset for unbiased-in-expectation halving without RNG) promotes
      * to level i+1 at doubled weight. */
    private def cascade(i: Int): Unit = {
      val sorted = levels(i).sorted
      val offset = (compactions & 1L).toInt
      compactions += 1
      if (levels.length == i + 1) levels += ArrayBuffer.empty[Double]
      var j = offset
      while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
      levels(i).clear()
      if (levels(i + 1).length > capacity) cascade(i + 1)
    }

    def mergeIn(other: Summary): Unit = {
      // fold the other side's compaction count so the alternating
      // offset keeps cycling across a merge tree rather than being
      // reset to the surviving buffer's local parity
      compactions += other.compactions
      while (levels.length < other.levels.length)
        levels += ArrayBuffer.empty[Double]
      var i = 0
      while (i < other.levels.length) {
        levels(i) ++= other.levels(i)
        i += 1
      }
      i = 0
      while (i < levels.length) {
        if (levels(i).length > capacity) cascade(i)
        i += 1
      }
    }

    /** Lower quantiles by weighted rank: for each qBp, the smallest
      * value whose cumulative weight reaches ceil(W·qBp/10000) —
      * integer arithmetic only. One flatten + sort serves ALL requested
      * quantiles. NaN entries for an empty summary. */
    def quantiles(qBps: Seq[Int]): Array[Double] = {
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      if (items.isEmpty) return Array.fill(qBps.length)(Double.NaN)
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      // one cumulative pass answers the targets in ascending order
      val byTarget = qBps.zipWithIndex
        .map { case (q, ix) => ((total * q + 9999L) / 10000L, ix) }
        .sortBy(_._1)
      val out = new Array[Double](qBps.length)
      var cum = 0L
      var j = 0
      var t = 0
      while (j < sorted.length && t < byTarget.length) {
        cum += sorted(j)._2
        while (t < byTarget.length && cum >= byTarget(t)._1) {
          out(byTarget(t)._2) = sorted(j)._1
          t += 1
        }
        j += 1
      }
      while (t < byTarget.length) { out(byTarget(t)._2) = sorted.last._1; t += 1 }
      out
    }

    /** Single-quantile convenience (tests). */
    def quantile(qBp: Int): Double = quantiles(Seq(qBp))(0)

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(compactions)
      out.writeInt(levels.length)
      levels.foreach { buf =>
        out.writeInt(buf.length)
        buf.foreach(out.writeDouble)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte], capacity: Int): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val s = new Summary(capacity)
      s.compactions = in.readLong()
      val nLevels = in.readInt()
      while (s.levels.length < nLevels) s.levels += ArrayBuffer.empty[Double]
      var i = 0
      while (i < nLevels) {
        val n = in.readInt()
        var j = 0
        while (j < n) { s.levels(i) += in.readDouble(); j += 1 }
        i += 1
      }
      s
    }
  }

  /** Column API: quantiles at `qBp` basis points (5000 = median) over a
    * double column → array<double> in qBp order. */
  def quantilesBp(v: Column, qBp: Seq[Int], capacity: Int): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(v), qBp, capacity)
        .toAggregateExpression())
}
