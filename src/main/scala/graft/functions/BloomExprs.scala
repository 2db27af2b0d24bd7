package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd Catalyst predicate.
  *
  * Carries the SERIALIZED filter (the expression tree ships to
  * executors inside the task binary, so the payload must be a plain
  * byte array) and deserializes once per executor via a transient
  * lazy. Put/probe symmetry is owned entirely by this module:
  * [[graft.operators.BloomJoin.bloomOf]] inserts integral keys with
  * `putLong` and strings with their UTF-8 bytes (`putBinary`), and
  * this probe reads them back the same way — no dependence on any
  * engine-internal hashing of `bloom_filter_agg`.
  *
  * NULL input → NULL (standard null-intolerant predicate); callers
  * decide null routing (a semi join drops nulls, an anti join must
  * route them to the bypass branch — see `BloomJoin.antiJoin`).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "might_contain_bloom"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an integral or string key, got ${other.sql}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => bloom.mightContainBinary(
      input.asInstanceOf[UTF8String].getBytes)
    case _ => bloom.mightContainLong(input.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
