package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.ColumnShim

/** Custom whole-operator: per-key top-k without a per-partition full
  * sort (SURVEY §2.12 / guide preference (c): LogicalPlan + Strategy
  * + SparkPlan).
  *
  * The built-in expression of "k best rows per key" is
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`,
  * which sorts EVERY group's rows. This operator keeps one bounded
  * binary heap per key (O(n log k) instead of O(n log n), memory
  * O(keys·k) instead of O(partition)) — the difference between
  * sorting a 100 TB corpus per query and streaming over it once.
  *
  * Exact, not approximate: `ordering` must be a total order (callers
  * append unique tiebreak columns), so output rows equal the window
  * form's — only cheaper. Shuffle: requiredChildDistribution clusters
  * by key, so Catalyst inserts exactly the same exchange a window
  * would need.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = ordering
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per-key bounded heap; heap root = worst retained row
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val reverse = new java.util.Comparator[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = -rowOrd.compare(a, b)
      }
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.add(toUnsafe(row).copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }
      val out = Iterator.newBuilder[InternalRow]
      heaps.values().forEach { heap =>
        val arr = new Array[UnsafeRow](heap.size)
        var i = heap.size - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // heap pops worst-first
        arr.foreach(out += _)
      }
      out.result()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Keep the k best rows per key under (orderCols, tiebreaks) —
    * callers must make the combined order total for determinism.
    * Registers the planner strategy on first use. */
  def apply(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = ColumnShim.logicalPlan(df)
    val keyExprs = keyCols.map(ColumnShim.expression)
    val sortOrder = orderCols.map { c =>
      ColumnShim.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    ColumnShim.ofRows(spark, TopKPerKeyPlan(keyExprs, sortOrder, k, child))
  }
}
