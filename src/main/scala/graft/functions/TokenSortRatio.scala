package graft.functions

import graft.kernels.FuzzyKernels
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable `token_sort_ratio(a string, b string) -> int` — exact
  * fuzzywuzzy/difflib parity (FuzzyKernels), as a native Catalyst
  * BinaryExpression so fuzzy joins stay in Catalyst null handling (the
  * reference's dropdown matcher, endpoint_upload.py:215,223). Registered
  * alongside extract_main_text via [[GraftExtensions]].
  *
  * Full `doGenCode` (static call into the kernel): the expression
  * participates in whole-stage codegen instead of breaking the stage the
  * way CodegenFallback would — fuzzy-join projections stay in one
  * generated function.
  */
case class TokenSortRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_sort_ratio expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyKernels.tokenSortRatio(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.kernels.FuzzyKernels.tokenSortRatio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSortRatio =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "token_sort_ratio"
}

object TokenSortRatio {
  val fnName: FunctionIdentifier = FunctionIdentifier("token_sort_ratio")
  val fnInfo: ExpressionInfo =
    new ExpressionInfo(classOf[TokenSortRatio].getName, "token_sort_ratio")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "token_sort_ratio takes exactly 2 arguments")
    TokenSortRatio(args.head, args(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(fnName, fnInfo, builder)
}
