package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `top_cells(score, cell, n)`: the n cells with the HIGHEST score per
  * group (ties break to the lowest cell id), as a
  * [[TypedImperativeAggregate]] with STRICTLY BOUNDED state — each
  * partial holds at most n (score, cell) entries, so the map-side
  * combine truncates the nCells-fold centroid-scoring expansion before
  * any exchange: the shuffle carries one n-entry row per vector, never
  * corpus × nCells rows (what a window-rank or collect_list formulation
  * would move). This is the aggregate behind the large-nCells IVF
  * multi-probe map, where nCells ≈ √corpus makes per-row literal
  * scoring (codegen size) and unbounded collects (shuffle volume) both
  * infeasible.
  *
  * Ordering is (score desc, cell asc) — identical to the literal-array
  * `sort_array(struct(-score, cell))` path it replaces, so the two
  * strategies are bit-equal on the same rounded scores (spec-gated). */
case class TopCells(
    score: Expression, cell: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopCells.Buf] {

  require(n >= 1, s"top_cells needs n >= 1, got $n")

  override def children: Seq[Expression] = Seq(score, cell)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TopCells.Buf = new TopCells.Buf(n)

  override def update(buf: TopCells.Buf, input: InternalRow): TopCells.Buf = {
    val s = score.eval(input)
    val c = cell.eval(input)
    if (s != null && c != null)
      buf.offer(s.asInstanceOf[Double], c.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: TopCells.Buf, other: TopCells.Buf): TopCells.Buf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopCells.Buf): Any =
    new GenericArrayData(buf.result)

  override def serialize(buf: TopCells.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopCells.Buf =
    TopCells.Buf.fromBytes(bytes, n)

  override def withNewMutableAggBufferOffset(o: Int): TopCells =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopCells =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopCells =
    copy(score = newChildren(0), cell = newChildren(1))
}

object TopCells {

  /** Sorted bounded buffer: entries kept in (score desc, cell asc)
    * order; n is small (a probe width), so linear insertion beats any
    * heap's constant factors. */
  final class Buf(n: Int) {
    private val scores = new Array[Double](n)
    private val cells = new Array[Long](n)
    private var size = 0

    /** (score desc, cell asc) with NaN ordered WORST — the same rank a
      * NaN gets in the literal `sort_array(struct(-score, cell))` path
      * (Spark sorts NaN greatest, so negated-NaN lands last): a strict
      * `>` alone would let an early NaN lodge at the top and block
      * every later entry. */
    private def beats(s1: Double, c1: Long, s2: Double, c2: Long): Boolean = {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 != n2) n2
      else if (!n1 && s1 != s2) s1 > s2
      else c1 < c2
    }

    def offer(s: Double, c: Long): Unit = {
      var pos = size
      while (pos > 0 && beats(s, c, scores(pos - 1), cells(pos - 1))) pos -= 1
      if (pos < n) {
        var i = math.min(size, n - 1)
        while (i > pos) { scores(i) = scores(i - 1); cells(i) = cells(i - 1); i -= 1 }
        scores(pos) = s; cells(pos) = c
        if (size < n) size += 1
      }
    }

    def mergeIn(o: Buf): Unit = {
      var i = 0
      while (i < o.size) { offer(o.scores(i), o.cells(i)); i += 1 }
    }

    def result: Array[Long] = java.util.Arrays.copyOf(cells, size)

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + size * 16)
      bb.putInt(size)
      var i = 0
      while (i < size) { bb.putDouble(scores(i)); bb.putLong(cells(i)); i += 1 }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte], n: Int): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val m = bb.getInt
      val b = new Buf(n)
      var i = 0
      while (i < m) { b.offer(bb.getDouble, bb.getLong); i += 1 }
      b
    }
  }

  /** Column API: the n highest-`score` `cell` ids per group, ordered
    * (score desc, cell asc). */
  def topCells(score: Column, cell: Column, n: Int): Column =
    ColumnBridge.column(
      TopCells(ColumnBridge.expression(score), ColumnBridge.expression(cell), n)
        .toAggregateExpression())
}
