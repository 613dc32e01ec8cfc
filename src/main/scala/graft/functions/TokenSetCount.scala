package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_set_count(tokens, set)`: how many elements of an `array<string>`
  * (repeats counted) belong to a fixed string set.
  *
  * Replaces `size(filter(toks, t => t.isInCollection(set)))` on the text
  * scoring hot path: the `filter` higher-order function is
  * `CodegenFallback`, which drops the WHOLE projection out of whole-stage
  * codegen and re-evaluates the surrounding expression tree interpreted.
  * This expression is a codegen'd hash-set probe per token.
  */
case class TokenSetCount(child: Expression, set: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_set_count expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenSetCount.countIn(input.asInstanceOf[ArrayData], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", lookup,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TokenSetCount.countIn($a, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

object TokenSetCount {

  def countIn(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  def tokenSetCount(tokens: Column, set: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(ColumnBridge.expression(tokens), set))
}
