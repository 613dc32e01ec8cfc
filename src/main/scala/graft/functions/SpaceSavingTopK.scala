package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `space_saving_topk(term, k, capacity)`: mergeable heavy-hitters
  * sketch (Metwally et al. Space-Saving) as a
  * [[TypedImperativeAggregate]] — the custom-sketch escalation path when
  * built-in aggregates can't express mergeable summary semantics.
  *
  * Bounded state: at most `capacity` counters per group regardless of
  * stream length — the property that makes frequent-item queries
  * feasible over 100 TB where an exact groupBy-count's key space
  * explodes. Each reported item carries (count, err): the true
  * frequency f satisfies count − err ≤ f ≤ count.
  *
  *  - `capacity ≥ |distinct terms|`: degenerates to EXACT counting
  *    (err = 0, deterministic) — the regime the oracle-checked query
  *    runs in.
  *  - `capacity < |distinct terms|`: classic approximate regime; counts
  *    depend on arrival/merge order but the (count, err) bounds always
  *    hold and items with f > n/capacity are guaranteed present —
  *    gated on skewed synthetic data in the spec.
  *
  * Partial aggregation works through serialize/merge: map-side sketches
  * shuffle as compact byte arrays (capacity-bounded), never raw rows.
  * Eviction and merge tie-breaks are lexicographic, so the exact regime
  * is reproducible bit-for-bit.
  */
case class SpaceSavingTopK(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingTopK.Summary] {

  require(k >= 1 && capacity >= k, s"need 1 <= k ($k) <= capacity ($capacity)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingTopK.OutputType

  override def createAggregationBuffer(): SpaceSavingTopK.Summary =
    new SpaceSavingTopK.Summary(capacity)

  override def update(buf: SpaceSavingTopK.Summary, input: InternalRow): SpaceSavingTopK.Summary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingTopK.Summary,
                     other: SpaceSavingTopK.Summary): SpaceSavingTopK.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: SpaceSavingTopK.Summary): Any = {
    val top = buf.top(k)
    new GenericArrayData(top.map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    })
  }

  override def serialize(buf: SpaceSavingTopK.Summary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Summary =
    SpaceSavingTopK.Summary.fromBytes(bytes, capacity)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {

  val OutputType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Mutable capacity-bounded counter summary. */
  final class Summary(capacity: Int) {
    private[SpaceSavingTopK] val counters = mutable.HashMap.empty[String, Array[Long]]
    /** True once any eviction (or merge truncation) has occurred. The
      * Space-Saving invariant then reads: any term ABSENT from the
      * summary has true count ≤ the current minimum counter. While
      * false, absent terms have true count 0 — tracking this keeps the
      * capacity ≥ vocab regime exact through merges. */
    private[SpaceSavingTopK] var evicted: Boolean = false

    private def minCount: Long =
      if (counters.isEmpty) 0L else counters.valuesIterator.map(_(0)).min

    /** Add `inc` observations of `term` (with inherited error `err`).
      * At capacity, the minimum-count entry (lexicographic tie-break,
      * for determinism) is evicted and its count becomes the newcomer's
      * error floor — the Space-Saving invariant. */
    def offer(term: String, inc: Long, err: Long): Unit =
      counters.get(term) match {
        case Some(ce) => ce(0) += inc; ce(1) += err
        case None =>
          if (counters.size < capacity) {
            counters(term) = Array(inc, err)
          } else {
            var minTerm: String = null
            var min = Long.MaxValue
            counters.foreach { case (t, ce) =>
              if (ce(0) < min || (ce(0) == min && (minTerm == null || t < minTerm))) {
                min = ce(0); minTerm = t
              }
            }
            counters.remove(minTerm)
            counters(term) = Array(min + inc, min + err)
            evicted = true
          }
      }

    /** Mergeable-summaries merge (Agarwal et al.): shared keys sum
      * count and err; a key absent from one side gets that side's
      * absent-key bound — its minimum counter if it ever evicted, else
      * 0 — added to BOTH count and err, since the absent side's true
      * frequency lies in [0, floor]. Then truncate to the `capacity`
      * largest counts (lexicographic tie-break): dropped counts are ≤
      * the surviving minimum, so the absent-key invariant is preserved.
      * The bound count − err ≤ f ≤ count holds under any merge
      * topology (property-tested in ExpressionEdgeSpec), and the
      * capacity ≥ vocab regime stays exact (floors 0, no truncation). */
    def mergeIn(other: Summary): Unit = {
      val mSelf = if (evicted) minCount else 0L
      val mOther = if (other.evicted) other.minCount else 0L
      val merged = mutable.HashMap.empty[String, Array[Long]]
      counters.foreach { case (t, ce) =>
        other.counters.get(t) match {
          case Some(oe) => merged(t) = Array(ce(0) + oe(0), ce(1) + oe(1))
          case None     => merged(t) = Array(ce(0) + mOther, ce(1) + mOther)
        }
      }
      other.counters.foreach { case (t, oe) =>
        if (!counters.contains(t)) merged(t) = Array(mSelf + oe(0), mSelf + oe(1))
      }
      evicted |= other.evicted
      counters.clear()
      if (merged.size <= capacity) counters ++= merged
      else {
        counters ++= merged.toArray.sortBy { case (t, ce) => (-ce(0), t) }.take(capacity)
        evicted = true
      }
    }

    def top(k: Int): Array[(String, Long, Long)] =
      counters.toArray
        .map { case (t, ce) => (t, ce(0), ce(1)) }
        .sortBy { case (t, c, _) => (-c, t) }
        .take(k)

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeBoolean(evicted)
      out.writeInt(counters.size)
      counters.foreach { case (t, ce) =>
        out.writeUTF(t); out.writeLong(ce(0)); out.writeLong(ce(1))
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte], capacity: Int): Summary = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val s = new Summary(capacity)
      s.evicted = in.readBoolean()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        s.counters(in.readUTF()) = Array(in.readLong(), in.readLong())
        i += 1
      }
      s
    }
  }

  /** Column API: aggregate a string column into the top-k
    * (term, count, err) structs. */
  def topK(term: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(term), k, capacity)
        .toAggregateExpression())
}
