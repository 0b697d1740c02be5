package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the standard 4× memory /
  * bandwidth reduction for vector serving at 100 TB (FAISS SQ8-style
  * scalar quantization, public knowledge): per vector,
  * `scale = 127 / max|x|` and `q_i = floor(x_i · scale + 0.5)`
  * (round-half-up, identical in any IEEE engine), zero vectors map
  * to zeros. Pure Column expressions: quantization rides the scan,
  * no UDF, no shuffle; downstream ANN candidate generation can run
  * on the int8 vectors (integer dot products) with the float rerank
  * touching only finalists.
  */
object Quantize {

  /** max |x_i| of a float-array column, in double (float→double is
    * exact, so this value is bit-identical in any engine). */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric int8 quantized vector (array<int> with values in
    * [−127, 127]); all-zero input → all-zero output. */
  def int8(v: Column): Column = {
    val m = maxAbs(v)
    when(m === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v,
        x => floor(x.cast("double") * (lit(127.0) / m) + 0.5).cast("int")))
  }

  /** Integer dot product of two quantized vectors — exact (no float
    * accumulation), the cheap first-pass score for int8 ANN. Since
    * r13 the native fused-loop expression
    * ([[FloatVecExpr.dotI]] / [[IntVecDotL]]) instead of the
    * allocating `aggregate(zip_with(...))` HOF: integer addition is
    * order-free, so the swap is bit-identical for every consumer. */
  def dotQ(a: Column, b: Column): Column = FloatVecExpr.dotI(a, b)
}
