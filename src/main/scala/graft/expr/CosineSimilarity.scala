package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Cosine similarity between two `array<float>` embedding vectors, as a native
 * Catalyst expression with whole-stage codegen (no UDF boxing in the hot
 * path — this runs once per row per query vector over the `results` /
 * `embeddings` scan, the single hottest loop of the RAG core).
 *
 * Semantics mirror the reference's vector search (`db.index.vector.queryNodes`
 * with a cosine index — /root/reference/openai_agents/memory/neo4j_rag.py:40-43,
 * 256-297):
 *   - null if either input is null,
 *   - null if either vector has zero norm (SURVEY.md §7.4: the 0-norm risk is
 *     resolved as score=null, which downstream threshold filters drop),
 *   - null if lengths differ (a malformed row must not poison a 100 TB scan),
 *   - accumulation in double precision over float elements.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Public-API type check (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4.1 — callers cast to array<float> explicitly).
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  // Non-null inputs can still produce null (zero norm / length mismatch).
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        final int $n = $x.numElements();
        if ($n != $y.numElements() || $n == 0) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $xi = (double) $x.getFloat($i);
            final double $yi = (double) $y.getFloat($i);
            $dot += $xi * $yi;
            $nx += $xi * $xi;
            $ny += $yi * $yi;
          }
          if ($nx == 0.0 || $ny == 0.0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
          }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/**
 * Dot product of two `array<float>` vectors (double accumulation). Used by
 * the ANN path on pre-normalized vectors, where cosine == dot and the two
 * norm loops are wasted work at 100 TB.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        final int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
          }
          ${ev.value} = $dot;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
