package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf
import graft.dedup.Dedup
import graft.text.Tok
import graft.textan.{Scrub, TextAnalysis}
import graft.vector.FloatVecDot

/** SQL-surface registration: exposes the engine's scalar extensions
  * to `spark.sql(...)` users, completing the reference's "custom SQL"
  * path (`Frontend/app.py:274-309`) with the engine's own functions.
  *
  *  - `graft_dot(a, b)` — native codegen'd float-vector dot product
  *    (Catalyst expression, not a UDF);
  *  - `graft_token_count(s)` — the engine tokenizer (F7);
  *  - `graft_simhash(s)` — 60-bit SimHash;
  *  - `graft_lang_id(s)` / `graft_quality(s)` /
  *    `graft_fingerprint(s)` — the text-analysis suite as plain
  *    Catalyst expression trees (registered via [[graft.textan
  *    .TextAnalysis]]'s Column builders, so they stay codegen'd and
  *    oracle-portable — no UDF in the hot path).
  */
object GraftFunctions {
  private val shim = org.apache.spark.sql.graftshim.ColumnShim

  /** Clean SQL-side arity error (Spark's builtin wording) instead of
    * an IndexOutOfBoundsException from a bare `exprs(1)`. */
  private def arity[A](name: String, expected: Int,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])(
      build: => A): A = {
    if (exprs.length != expected)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name. " +
          s"Expected: $expected; Found: ${exprs.length}")
    build
  }

  def register(spark: SparkSession): Unit = {
    shim.registerExpression(
      spark, "graft_dot",
      exprs => arity("graft_dot", 2, exprs)(FloatVecDot(exprs.head, exprs(1))))
    spark.udf.register("graft_token_count", udf((s: String) =>
      if (s == null) 0 else Tok.count(s)))
    spark.udf.register("graft_simhash", udf((s: String) => Dedup.simhash60(s)))
    shim.registerExpression(spark, "graft_lang_id",
      exprs => shim.expression(TextAnalysis.detectLang(shim.column(exprs.head))))
    shim.registerExpression(spark, "graft_quality",
      exprs => shim.expression(TextAnalysis.qualityScore(shim.column(exprs.head))))
    shim.registerExpression(spark, "graft_fingerprint",
      exprs => shim.expression(
        TextAnalysis.contentFingerprint(shim.column(exprs.head))))
    shim.registerExpression(spark, "graft_redact",
      exprs => shim.expression(Scrub.redact(shim.column(exprs.head))))
    shim.registerExpression(spark, "graft_hash_bucket",
      exprs => shim.expression(
        graft.rel.Sampling.hashBucket(shim.column(exprs.head))))
    shim.registerExpression(spark, "graft_indexes_of",
      exprs => arity("graft_indexes_of", 2, exprs)(
        graft.text.StringIndexesOf(exprs.head, exprs(1))))
    shim.registerExpression(spark, "graft_affix_overlap",
      exprs => arity("graft_affix_overlap", 2, exprs)(
        graft.text.LongestAffixOverlap(exprs.head, exprs(1))))
    shim.registerExpression(spark, "graft_int8",
      exprs => arity("graft_int8", 1, exprs)(
        shim.expression(graft.vector.Quantize.int8(shim.column(exprs.head)))))
    spark.udf.register("graft_nfc", udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    // C2 as a SQL generator: LATERAL VIEW graft_chunk_recursive(text[, size, overlap])
    shim.registerExpression(spark, "graft_chunk_recursive",
      exprs => graft.text.chunk.RecursiveChunkGenerator(exprs))
  }
}
