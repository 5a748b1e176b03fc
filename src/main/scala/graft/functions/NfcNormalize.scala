package graft.functions

import graft.kernels.UnicodeKernel
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable `nfc(s string) -> string` — Unicode NFC normalization as
  * a native Catalyst UnaryExpression (Spark has no built-in normalizer;
  * DuckDB's `nfc_normalize` is the cross-engine oracle). Registered via
  * [[GraftExtensions]] so `spark.sql("select nfc(text) ...")` works on a
  * cluster with zero imperative setup.
  *
  * Full `doGenCode` (static call into [[UnicodeKernel]]) keeps the
  * projection inside whole-stage codegen; the kernel's `isNormalized`
  * fast path makes the common all-ASCII row a scan, not an allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UnicodeKernel.nfc(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.kernels.UnicodeKernel.nfc($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object NfcNormalize {
  val fnName: FunctionIdentifier = FunctionIdentifier("nfc")
  val fnInfo: ExpressionInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "nfc takes exactly 1 argument")
    NfcNormalize(args.head)
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(fnName, fnInfo, builder)
}
