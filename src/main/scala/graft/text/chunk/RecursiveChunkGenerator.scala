package graft.text.chunk

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C2 as a SQL-callable Catalyst `Generator` — the recursive
  * separator chunker ([[RecursiveChunker]], reference
  * `/root/reference/Chunking_Strats/chromadb_rag.py:64-72`) composable
  * directly in `spark.sql`, the same way C1's fixed windows compose
  * from builtins:
  *
  * {{{
  *   SELECT doc_id, c.chunk_index, c.chunk_text, c.start, c.end
  *   FROM docs LATERAL VIEW graft_chunk_recursive(text) c
  *   -- or with explicit budgets:
  *   ... LATERAL VIEW graft_chunk_recursive(text, 400, 50) c
  * }}}
  *
  * Same execution shape as [[RecursiveChunker.chunk]]: the generator
  * fans rows out in the SCAN stage (no shuffle, no encoder
  * round-trip), emitting one row per chunk with the exact substring
  * and its birth offsets — `chunk_text = substr(text, start+1,
  * end-start)` by construction, so the DataFrame and SQL forms are
  * row-identical. `chunkSize`/`overlap` must be foldable (they
  * parameterize the kernel once per plan, not per row).
  */
case class RecursiveChunkGenerator(children: Seq[Expression])
  extends Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = true),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty || children.length == 2 || children.length > 3)
      TypeCheckResult.TypeCheckFailure(
        "graft_chunk_recursive expects (text) or (text, chunkSize, overlap)")
    else if (children.head.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("text must be STRING")
    else if (children.drop(1).exists(c =>
        !c.foldable || !Seq[DataType](ByteType, ShortType, IntegerType,
          LongType).contains(c.dataType)))
      TypeCheckResult.TypeCheckFailure(
        "chunkSize and overlap must be integral literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val chunker: RecursiveChunker =
    if (children.length == 3)
      RecursiveChunker(
        chunkSize = children(1).eval(null).asInstanceOf[Number].intValue,
        overlap = children(2).eval(null).asInstanceOf[Number].intValue)
    else RecursiveChunker()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = children.head.eval(input)
    if (raw == null) Nil
    else {
      val text = raw.toString
      val offs = chunker.mergedOffsets(text)
      val out = new Array[InternalRow](offs.length)
      var i = 0
      while (i < offs.length) {
        val (a, b) = offs(i)
        out(i) = InternalRow(i, UTF8String.fromString(text.substring(a, b)), a, b)
        i += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RecursiveChunkGenerator =
    copy(children = newChildren)
}
