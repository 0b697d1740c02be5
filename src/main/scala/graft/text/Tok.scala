package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic tokenizer (reference F7: `len(tiktoken.encode(text))`,
  * `/root/reference/Chunking_Strats/kamredt_chunking.py:48-50`).
  *
  * tiktoken's cl100k_base is not reproducible in a zero-dependency
  * Scala engine, so the engine defines its own spec (SURVEY.md §7.3):
  * a token is either a maximal run of alphanumerics or a single
  * non-space symbol. The regex is kept inside the RE2-compatible
  * subset so the very same pattern runs in Spark (java.util.regex)
  * and in the DuckDB oracle (`regexp_extract_all`), giving bit-equal
  * token counts on both sides.
  */
object Tok {
  /** Portable whitespace CLASS BODY (interpolate inside `[...]`).
    * Java's `\s` includes vertical tab U+000B while DuckDB's RE2 `\s`
    * is `[\t\n\f\r ]` — a document containing VT would silently break
    * cross-engine parity for every whitespace-driven count. Spelling
    * the set explicitly (JAVA's set, so Spark-side behavior is
    * bit-identical to the historical `\s` forms) makes both engines
    * agree by construction; `\x0B` parses identically in
    * java.util.regex and RE2. */
  val Ws: String = " \\t\\n\\x0B\\f\\r"

  /** Shared token pattern — keep in sync with [[Tok.oracleRegex]]. */
  val pattern: String = s"[A-Za-z0-9]+|[^A-Za-z0-9$Ws]"
  /** The literal to embed in DuckDB oracle SQL. */
  val oracleRegex: String = pattern

  private val compiled = java.util.regex.Pattern.compile(pattern)

  /** Column of tokens — codegen'd regexp, no UDF in the hot path. */
  def tokens(c: Column): Column = regexp_extract_all(c, lit(pattern), lit(0))

  /** Token count as a Column (F7). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Driver/executor-side Scala tokenizer with identical semantics —
    * used by the recursive chunker's flatMap (C2), where token budgets
    * are evaluated per fragment outside the Column world. */
  def tokenize(s: String): Vector[String] = {
    val m = compiled.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  def count(s: String): Int = {
    val m = compiled.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Token count of `s[from, to)` without allocating the substring —
    * an opaque matcher region behaves exactly like `count(s.substring
    * (from, to))`. Callers cut only at non-alphanumeric boundaries, so
    * region edges never split a token. */
  def countRegion(s: String, from: Int, to: Int): Int = {
    val m = compiled.matcher(s).region(from, to)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Start offset of every token, ONE matcher pass — lets a caller
    * that needs token counts for MANY regions of the same string
    * (the recursive chunker probes ~|tokens| fragments per document)
    * replace per-region matcher setups with binary searches. */
  def tokenStarts(s: String): Array[Int] = {
    val m = compiled.matcher(s)
    val b = new scala.collection.mutable.ArrayBuilder.ofInt
    while (m.find()) b += m.start()
    b.result()
  }

  /** Tokens AND their start offsets in ONE matcher pass — for
    * kernels that need both the strings (e.g. hash bucketing) and
    * offset slicing ([[countStarts]]-style) without tokenizing the
    * document twice. */
  def tokensAndStarts(s: String): (Array[String], Array[Int]) = {
    val m = compiled.matcher(s)
    val ts = Array.newBuilder[String]
    val st = new scala.collection.mutable.ArrayBuilder.ofInt
    while (m.find()) { ts += m.group(); st += m.start() }
    (ts.result(), st.result())
  }

  /** #tokens starting in `[from, to)` over a [[tokenStarts]] array —
    * equals [[countRegion]] whenever region edges do not split a
    * token (the chunker cut invariant: cuts land only at separator
    * boundaries, and a token never spans a separator). */
  def countStarts(starts: Array[Int], from: Int, to: Int): Int =
    lowerBound(starts, to) - lowerBound(starts, from)

  private[text] def lowerBound(a: Array[Int], key: Int): Int = {
    val i = java.util.Arrays.binarySearch(a, key)
    if (i >= 0) i else -(i + 1)
  }
}
