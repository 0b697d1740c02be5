package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-from-previous-match "find all occurrences" kernel.
  *
  * The pure-SQL form (`filter(sequence(1, n−m+1), p -> substr(doc, p,
  * m) = chunk)`) is oracle-portable but does O(doclen · chunklen)
  * character compares per row AND materializes a ~doclen-int array
  * before the filter — the one advisory hot spot of the r4 audit.
  * This kernel steps `UTF8String.indexOf` from one past the previous
  * match (overlapping occurrences included, exactly like the
  * all-positions form), so per-row cost is one linear scan plus work
  * proportional to the number of matches, and the only allocation is
  * the result array. 1-based char positions (`locate` convention);
  * empty needle → empty array; no match → empty array.
  */
object StrOps {
  def indexesOf(hay: UTF8String, nee: UTF8String): ArrayData = {
    if (nee.numChars() == 0) return new GenericArrayData(Array.empty[Int])
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var from = 0
    var p = hay.indexOf(nee, from)
    while (p >= 0) {
      buf += p + 1
      from = p + 1
      p = hay.indexOf(nee, from)
    }
    new GenericArrayData(buf.toArray)
  }

  /** Longest L such that `a`'s L-char suffix equals `b`'s L-char
    * prefix, via the KMP prefix-function automaton: build π over `b`,
    * stream `a` through it; the final automaton state IS the longest
    * b-prefix that is an a-suffix. One linear pass (O(|a|+|b|) code
    * points, O(|b|) ints) — vs the HOF form's O(min²) substring
    * compares plus a materialized length-min int array per pair.
    * Code-point arrays (not UTF-16 units) so lengths agree with SQL
    * `substr`/`length` character semantics on astral chars. */
  private def sufPre(a: Array[Int], b: Array[Int]): Int = {
    val m = b.length
    if (m == 0 || a.length == 0) return 0
    val pi = new Array[Int](m)
    var k = 0
    var i = 1
    while (i < m) {
      while (k > 0 && b(i) != b(k)) k = pi(k - 1)
      if (b(i) == b(k)) k += 1
      pi(i) = k
      i += 1
    }
    k = 0
    i = 0
    while (i < a.length) {
      if (k == m) k = pi(k - 1) // full b matched mid-stream; fall back
      while (k > 0 && a(i) != b(k)) k = pi(k - 1)
      if (a(i) == b(k)) k += 1
      i += 1
    }
    k // ≤ min(|a|, |b|): at most one increment per consumed char of a
  }

  /** max(sufPre(a,b), sufPre(b,a)) — the symmetric "how much do these
    * two chunks overlap end-to-start" scorer of J5. */
  def longestAffixOverlap(a: UTF8String, b: UTF8String): Int = {
    val ac = a.toString.codePoints().toArray
    val bc = b.toString.codePoints().toArray
    math.max(sufPre(ac, bc), sufPre(bc, ac))
  }
}

/** `indexesOf(haystack, needle)` — array<int> of ALL 1-based match
  * positions. Native expression with codegen (a static kernel call
  * inside whole-stage codegen, same style as [[graft.vector
  * .FloatVecDot]]), value-identical to the HOF filter form — asserted
  * in StrExprSpec, and the q_chunk_occurrences oracle keeps checking
  * the output against DuckDB's independent all-positions scan. */
case class StringIndexesOf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"StringIndexesOf needs two string inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(h: Any, n: Any): Any =
    StrOps.indexesOf(h.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n) => s"graft.text.StrOps.indexesOf($h, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringIndexesOf =
    copy(left = newLeft, right = newRight)
}

/** `longestAffixOverlap(a, b)` — int: the longest L where one input's
  * L-char suffix equals the other's L-char prefix (both directions).
  * Native codegen'd expression (static kernel call in whole-stage
  * codegen); value-identical to the O(L²) HOF filter form it replaced
  * in q_text_overlap_pairs — asserted in StrExprSpec, and that
  * query's DuckDB oracle remains the independent HOF scan. */
case class LongestAffixOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"LongestAffixOverlap needs two string inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StrOps.longestAffixOverlap(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.text.StrOps.longestAffixOverlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongestAffixOverlap =
    copy(left = newLeft, right = newRight)
}

/** `codePointSlices(text, bounds)` — array<string>: for each
  * `(start, end)` CODE-POINT offset pair in `bounds`, the slice
  * `text[start, end)`, value-identical to
  * `substr(text, start + 1, end − start)` per element.
  *
  * WHY a native expression: `UTF8String.substring` locates its start
  * by scanning code points from offset 0, so per-chunk `substr` over
  * one parent document costs O(start) EACH — chunking a document
  * into k windows is O(L²/stride) in ONE task, invisible on 600-char
  * fixture docs and fatal on a giant one (the r11 row-skew harness
  * measured the chunkers ~quadratic in doc length: 2 MB of text took
  * 10-180 s single-task). This kernel walks the document ONCE with a
  * forward cursor (ascending starts; an out-of-order start rescans,
  * correct but slow), so extracting all chunks is
  * O(L + total output) regardless of chunk count. Evaluated per
  * document row (CodegenFallback — the O(L) walk dwarfs the virtual
  * call), exploded afterward, exactly where the quadratic substr
  * projection used to sit. */
case class CodePointSlices(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StructType(fs), _))
          if fs.length == 2 && fs.forall(_.dataType == IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "codePointSlices needs (string, array<struct<int,int>>), got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(t: Any, b: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val bounds = b.asInstanceOf[ArrayData]
    val n = bounds.numElements()
    val len = s.length
    val totalCp = s.codePointCount(0, len)
    val out = new Array[Any](n)
    var cp = 0 // code-point cursor
    var ci = 0 // UTF-16 char cursor at code point `cp`
    var i = 0
    while (i < n) {
      val row = bounds.getStruct(i, 2)
      val sCp = math.min(math.max(row.getInt(0), 0), totalCp)
      val eCp = math.max(sCp, math.min(row.getInt(1), totalCp))
      if (sCp < cp) { cp = 0; ci = 0 } // out-of-order: restart
      val cs = s.offsetByCodePoints(ci, sCp - cp)
      val ce = s.offsetByCodePoints(cs, eCp - sCp)
      out(i) = UTF8String.fromString(s.substring(cs, ce))
      // cursor parks at the slice START so overlapping ascending
      // windows (the fixed chunker's stride < size) stay forward
      cp = sCp; ci = cs
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodePointSlices =
    copy(left = newLeft, right = newRight)
}

object StrExpr {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column wrapper: all 1-based occurrence positions of `needle` in
    * `haystack`. */
  def indexesOf(haystack: Column, needle: Column): Column =
    ColumnShim.column(StringIndexesOf(
      ColumnShim.expression(haystack), ColumnShim.expression(needle)))

  /** Column wrapper: longest suffix/prefix overlap length between two
    * strings, both directions. */
  def longestAffixOverlap(a: Column, b: Column): Column =
    ColumnShim.column(LongestAffixOverlap(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column wrapper: one-pass extraction of every `[start, end)`
    * code-point slice of `text` — the linear replacement for
    * per-chunk `substr` over one parent document. */
  def codePointSlices(text: Column, bounds: Column): Column =
    ColumnShim.column(CodePointSlices(
      ColumnShim.expression(text), ColumnShim.expression(bounds)))
}
