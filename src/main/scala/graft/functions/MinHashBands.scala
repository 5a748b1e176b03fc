package graft.functions

import graft.kernels.MinHashKernel
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable `minhash_bands(text string) -> array<string>` — the 4
  * MinHash LSH band keys (K=8 salted-md5 minima over 3-word shingles,
  * paired into 2-signature bands) as a native Catalyst expression with
  * full `doGenCode`. `posexplode(minhash_bands(text))` yields the
  * (band_no, bkey) long form the LSH bucket join shuffles on.
  */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(t: Any): Any =
    MinHashKernel.minhashBands(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.kernels.MinHashKernel.minhashBands($t)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinHashBands {
  val fnName: FunctionIdentifier = FunctionIdentifier("minhash_bands")
  val fnInfo: ExpressionInfo = new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "minhash_bands takes exactly 1 argument")
    MinHashBands(args.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(fnName, fnInfo, builder)
}
