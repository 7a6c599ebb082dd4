package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sliding-window text chunker: one document row → N chunk rows
 * (chunk_idx, chunk_start, chunk).
 *
 * Exact semantics of the reference's `chunk_text`
 * (/root/reference/openai_agents/memory/neo4j_rag.py:94-118, constants 42-43):
 *   - text of length ≤ `size` yields exactly ONE chunk (the whole text,
 *     including the empty string for empty text),
 *   - otherwise windows of `size` chars starting every `size - overlap`
 *     chars, looping while `start < len` — so the final chunk may be short
 *     (anything from 1 to `size` chars).
 *
 * Implemented as a Catalyst `CollectionGenerator` (not a UDF returning an
 * array) so the generate operator streams chunks without materializing a
 * per-row array, and `supportCodegen` via GenerateExec's fallback path keeps
 * the surrounding stages in whole-stage codegen. Offsets are CHARACTER
 * offsets (the reference slices Python str), hence UTF8String.substringSQL.
 */
case class ChunkText(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(size > 0, "chunk size must be positive")
  require(overlap >= 0 && overlap < size, "overlap must be in [0, size)")

  private val step = size - overlap

  override val inline: Boolean = false
  override val position: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_text expects a string column, got ${child.dataType.catalogString}")
    }
  }

  override def elementSchema: StructType = new StructType()
    .add("chunk_idx", IntegerType, nullable = false)
    .add("chunk_start", IntegerType, nullable = false)
    .add("chunk", StringType, nullable = false)

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val text = v.asInstanceOf[UTF8String]
    val len = text.numChars()
    // Capture the chunk-size param locally: inside the anonymous Iterator a
    // bare `size` binds to the inherited (self-consuming!) Iterator.size.
    val chunkSize = size
    val stepSize = step
    if (len <= chunkSize) {
      Iterator.single(InternalRow(0, 0, text))
    } else {
      // while start < len — trailing chunk may be short (neo4j_rag.py:108-118)
      new Iterator[InternalRow] {
        private var start = 0
        private var idx = 0
        override def hasNext: Boolean = start < len
        override def next(): InternalRow = {
          val chunk = text.substringSQL(start + 1, chunkSize)
          val row = InternalRow(idx, start, chunk)
          idx += 1
          start += stepSize
          row
        }
      }
    }
  }

  override def prettyName: String = "chunk_text"

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {
  /** Reference defaults: neo4j_rag.py:42-43. */
  val DefaultSize = 1000
  val DefaultOverlap = 200
}
