package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf
import graft.dedup.Dedup
import graft.text.Tok
import graft.textan.TextAnalysis
import graft.vector.FloatVecDot

/** SQL-surface registration: exposes the engine's scalar extensions
  * to `spark.sql(...)` users, completing the reference's "custom SQL"
  * path (`Frontend/app.py:274-309`) with the engine's own functions.
  *
  *  - `graft_dot(a, b)` — native codegen'd float-vector dot product
  *    (Catalyst expression, not a UDF);
  *  - `graft_token_count(s)` — the engine tokenizer (F7);
  *  - `graft_simhash(s)` — 32-bit SimHash.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ColumnShim.registerExpression(
      spark, "graft_dot", exprs => FloatVecDot(exprs.head, exprs(1)))
    spark.udf.register("graft_token_count", udf((s: String) =>
      if (s == null) 0 else Tok.count(s)))
    spark.udf.register("graft_simhash", udf((s: String) => Dedup.simhash32(s)))
  }
}
