package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for the similarity hot loop (SURVEY §2.9 /
 * the custom-operator preference order: a codegen'd `Expression` beats
 * composing higher-order functions once the operator is the per-row
 * bottleneck — `zip_with`+`aggregate` are CodegenFallback, so every
 * candidate pair paid interpreted-lambda dispatch per element).
 *
 * Semantics are bit-identical to the fold it replaces (and to the
 * DuckDB oracle): a strict left-to-right sum starting at 0.0 —
 * `(((0.0 + x₁y₁) + x₂y₂) + …)` — so hash-compared cosines are
 * unchanged. Norm is `sqrt(dot(v, v))`, the same fold.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred (Seq[ArrayType] <: Seq[AbstractDataType],
  // which is private[sql] and can't be named here)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column face of [[DotProduct]] — resolved through the session
    * catalog (the extension-injected builder), which is the public way
    * to reach a custom Expression from the Column API in Spark 4. */
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Registration triple for `SparkSessionExtensions.injectFunction` —
    * makes `dot_product(a, b)` available to `spark.sql(...)`. */
  val dotProductRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_product takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })
}
