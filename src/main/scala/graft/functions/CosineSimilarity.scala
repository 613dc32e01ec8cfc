package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(a, b)`: cosine similarity of two `array<double>` vectors as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Rationale (SURVEY.md §4, builder prompt): the built-in route —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_) / ...` — is three
  * `CodegenFallback` higher-order functions allocating an intermediate
  * array per row; on an O(n²) near-dup or top-k pairing that dominates the
  * profile. This expression is one fused loop in generated Java, no
  * allocation, null-safe via `nullSafeCodeGen`.
  *
  * Semantics match DuckDB's `list_cosine_similarity` (dot / (|a|·|b|)) so
  * oracle queries can compare (after a `round(_, 6)` on both sides to
  * absorb last-ulp differences). Mismatched lengths use the common prefix;
  * zero vectors yield NaN — callers filter if needed.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are pre-cast to array<double> by the [[CosineSimilarity.cosineSim]] builder
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var nx = 0d; var ny = 0d
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0d, $nx = 0d, $ny = 0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Column API: both inputs are cast to array<double> (accepts the
    * testdata's array<float> embeddings directly). */
  def cosineSim(a: Column, b: Column): Column = {
    val ad = a.cast(ArrayType(DoubleType))
    val bd = b.cast(ArrayType(DoubleType))
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(ad), ColumnBridge.expression(bd)))
  }
}
