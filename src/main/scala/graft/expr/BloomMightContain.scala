package graft.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_might_contain(key, filterBytes)` — membership probe against a
 * serialized `org.apache.spark.util.sketch.BloomFilter`, as a native codegen
 * expression.
 *
 * This is the engine's manual runtime-filter primitive: when the small side
 * of a join is too big to broadcast as rows but its KEY SET fits a bloom
 * sketch (12 MB handles ~10M keys at 1% fpp), probing the sketch on the big
 * side BEFORE the join shuffle drops most non-matching rows at scan time —
 * at 100 TB that converts a full-table shuffle into a shuffle of only the
 * ~matching fraction. False positives are harmless: the join that follows
 * eliminates them, so `bloomPrune(big) ⋈ small == big ⋈ small` exactly.
 * (Same mechanism as Spark's AQE `InjectRuntimeFilter`, exposed as an
 * explicit verb for plans where the automatic rewrite doesn't fire —
 * pre-bucketed inputs, custom sources, or thresholds tuned for clusters.)
 *
 * Semantics: null key → null (filter drops it, matching inner-join
 * behavior); integral keys probe `mightContainLong`, strings probe their
 * UTF-8 bytes (matching `DataFrameStatFunctions.bloomFilter` put-side
 * encoding). `filterBytes` must be a foldable binary (the serialized
 * sketch); it is deserialized once per task, not per row.
 */
case class BloomMightContain(child: Expression, filterBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = filterBytes

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    if (!keyOk) {
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be integral or string, got " +
          s"${child.dataType.catalogString}")
    } else if (filterBytes.dataType != BinaryType || !filterBytes.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter must be a foldable binary (serialized BloomFilter)")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  // Deserialized once per task (the expression tree is shipped serialized;
  // the lazy val re-reads the sketch from the literal on each executor).
  @transient private lazy val bloom: BloomFilter = {
    val bytes = filterBytes.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain filter bytes must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(key: Any, _bytes: Any): Any =
    child.dataType match {
      case LongType => bloom.mightContainLong(key.asInstanceOf[Long])
      case IntegerType => bloom.mightContainLong(key.asInstanceOf[Int].toLong)
      case ShortType => bloom.mightContainLong(key.asInstanceOf[Short].toLong)
      case ByteType => bloom.mightContainLong(key.asInstanceOf[Byte].toLong)
      case StringType =>
        bloom.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => child.dataType match {
      case LongType =>
        s"${ev.value} = $bloomRef.mightContainLong($key);"
      case ByteType | ShortType | IntegerType =>
        s"${ev.value} = $bloomRef.mightContainLong((long) $key);"
      case StringType =>
        s"${ev.value} = $bloomRef.mightContainBinary($key.getBytes());"
      case other => throw new IllegalStateException(s"unreachable: $other")
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(child = newLeft, filterBytes = newRight)
}
