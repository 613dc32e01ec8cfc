package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(tokens, n)`: distinct space-joined word n-grams of an
  * `array<string>` token column, fused into one pass.
  *
  * Replaces the `array_distinct(transform(sequence(0, size-n),
  * i -> concat_ws(' ', slice(w, i+1, n))))` HOF chain (four
  * CodegenFallback nodes, three intermediate arrays per row) on the
  * shingling hot path of MinHash dedup. Distinctness preserves first-
  * occurrence order. Fewer than n tokens → empty array (HOF-guard
  * semantics); null tokens are skipped within a gram like `concat_ws`.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGrams.distinctGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordNGrams.distinctGrams($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val Space = UTF8String.fromString(" ")

  def distinctGrams(tokens: ArrayData, n: Int): GenericArrayData = {
    val size = tokens.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](size * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= size - n) {
      var j = 0
      while (j < n) {
        window(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def wordNGrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n))
}
