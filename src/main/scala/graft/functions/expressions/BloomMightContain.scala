package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a native codegen'd predicate.
  *
  * The sketch ships as its SERIALIZED bytes (a query-local model
  * artifact, like the IVF centroid literals) and is deserialized once
  * per JVM/codegen instance — never per row, and the expression never
  * depends on `BloomFilter`'s own Java serializability. The child is
  * expected to be a 64-bit hash of the probe key (`xxhash64`), which is
  * never null, so the predicate itself is non-null and usable as a
  * scan-level filter.
  *
  * No-false-negative contract (the property the dedup correctness rests
  * on): every key put into the sketch answers `true`; `false` answers
  * are definitive. Property-pinned in BloomDedupSpec.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bloomCls = classOf[BloomFilter].getName
    val bloomVar = ctx.addMutableState(bloomCls, "graftBloom",
      v => s"""try {
              |  $v = $bloomCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
              |} catch (java.io.IOException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
