package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for every left (probe) row, the LATEST right (build)
  * row with the same key and time at-or-before the probe time. The
  * operator the brief calls out that Spark lacks natively; expressed
  * by COMPOSITION (preference (a) of the custom-operator ladder), not
  * a custom physical operator: both sides are tagged and unioned,
  * then ONE window per key ordered by (time, side, tiebreak) carries
  * the last non-null right payload forward — the classic
  * merge-scan as-of semantics.
  *
  * Why this shape at 100 TB: the naive `JOIN ... ON key = key AND
  * rt <= lt` + argmax explodes to |left| × |right-per-key| rows
  * before pruning; this form shuffles each side ONCE on the key and
  * scans each key's timeline linearly — cost is the union's sort, not
  * a quadratic join. Ties: a right row at exactly the probe time IS
  * visible ("at or before"); equal-time right rows resolve to the
  * highest `tieBreak` — deterministic and SQL-replayable.
  */
object AsOf {

  /** @param tieBreak right-side column breaking equal-time ties
    *                 (highest wins); must be non-null on the right
    *                 AND UNIQUE per (key, time) — with duplicate
    *                 (key, time, tieBreak) right rows the window's
    *                 sort order between them is unspecified and the
    *                 matched payload becomes nondeterministic.
    *
    * Caller contract: key and time columns are non-null on both
    * sides. (Unlike a SQL equi-join, the window groups null keys
    * TOGETHER — a null-keyed probe would match null-keyed builds;
    * filter nulls out first if that is not the intended semantics.) */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tieBreak: String): DataFrame = {
    // the tag/union below introduces these working names; a caller
    // column with the same name would be silently shadowed
    val reserved = Set("__k", "__t", "__tb", "__p", "__lp", "__side", "__m")
    val clash = ((left.columns ++ right.columns).filter(reserved) ++
      left.columns.filter(_ == "matched")).distinct
    require(clash.isEmpty,
      s"asOfJoin: input columns collide with internal/output names: ${clash.mkString(", ")}")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val tbType = right.schema(tieBreak).dataType
    val rTagged = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      col(tieBreak).as("__tb"),
      struct(right.columns.map(col): _*).as("__p"),
      lit(null).cast(lType).as("__lp"),
      lit(0).as("__side"))
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(null).cast(tbType).as("__tb"),
      lit(null).cast(rType).as("__p"),
      struct(left.columns.map(col): _*).as("__lp"),
      lit(1).as("__side"))
    // right rows sort before left at the same instant (side 0 < 1),
    // so an exactly-simultaneous right row is already visible; equal
    // (time, side) right rows sort by tiebreak and `last` keeps the
    // highest
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(col("__lp.*"), col("__m").as("matched"))
  }
}
