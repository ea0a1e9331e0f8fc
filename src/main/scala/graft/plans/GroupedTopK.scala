package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Grouped top-k as a first-class operator: custom logical node +
  * planner strategy + two physical operators (SURVEY §2.I — the brief's
  * extension path (c): LogicalPlan + SparkStrategy + SparkPlan via
  * SparkSessionExtensions).
  *
  * WHY an operator instead of the `row_number().over(partitionBy(g))`
  * window: the window plan shuffles EVERY row to its group's reducer and
  * then sorts whole groups, so shuffle volume is the full input and a
  * hot group sorts in one task. This operator keeps a bounded heap of k
  * rows per group ON THE MAP SIDE ([[PartialTopKExec]] — no required
  * distribution), so the exchange that [[FinalTopKExec]] requires moves
  * at most k·groups rows per input partition, and no task ever holds
  * more than k rows per group. The two-phase split is the aggregation
  * partial/final pattern applied to order statistics: lossless because a
  * row in a group's global top k is in that group's top k of whichever
  * partition holds it.
  *
  * Semantics: keep each group's k rows with the LARGEST `score`, ties
  * broken by SMALLEST `tie` — exactly `row_number() over (partition by
  * group order by score desc, tie asc) <= k`, with the original schema
  * (no rank column; derive it downstream if needed, the group is ≤ k
  * rows). Score/tie must be non-null.
  */
case class GroupedTopK(
    group: Seq[Expression],
    score: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, s, t, k, child) =>
      FinalTopKExec(g, s, t, k, PartialTopKExec(g, s, t, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The shared heap pass: one bounded min-heap of (score desc, tie asc)
  * per group key in the partition. Rows and keys are copied (Spark reuses
  * row buffers across an iterator).
  */
private[plans] object TopKPass {
  def run(iter: Iterator[InternalRow], output: Seq[Attribute],
      group: Seq[Expression], score: Expression, tie: Expression,
      k: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(group, output)
    val scoreB = BindReferences.bindReference(score, output)
    val tieB = BindReferences.bindReference(tie, output)
    // heap head = the WORST kept row (smallest score; among those, largest
    // tie), so a new row replaces the head iff it beats it
    implicit val ord: Ordering[(Double, Long, InternalRow)] =
      Ordering.by { case (s, t, _) => (-s, t) }
    val heaps = scala.collection.mutable.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Double, Long, InternalRow)]]()
    iter.foreach { row =>
      val s = scoreB.eval(row).asInstanceOf[Double]
      val t = tieB.eval(row).asInstanceOf[Long]
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          val h = scala.collection.mutable.PriorityQueue[(Double, Long, InternalRow)]()
          h.enqueue((s, t, row.copy()))
          heaps.put(key.copy(), h)
        case Some(h) =>
          if (h.size < k) h.enqueue((s, t, row.copy()))
          else {
            val (ws, wt, _) = h.head
            if (s > ws || (s == ws && t < wt)) { h.dequeue(); h.enqueue((s, t, row.copy())) }
          }
      }
    }
    heaps.valuesIterator.flatMap(_.iterator.map(_._3))
  }
}

/** Map-side bounded top-k: no distribution requirement, emits ≤ k rows
  * per (group, input partition). This is what keeps the exchange small.
  */
case class PartialTopKExec(group: Seq[Expression], score: Expression,
    tie: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKPass.run(_, child.output, group, score, tie, k),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce-side exact top-k: requires clustering on the group key (the
  * planner inserts the exchange over the partial's ≤ k·groups rows), and
  * the same heap pass is now exact because each group is co-located.
  */
case class FinalTopKExec(group: Seq[Expression], score: Expression,
    tie: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKPass.run(_, child.output, group, score, tie, k),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Public API + strategy registration (also injected by GraftExtensions). */
object GraftOps {
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(GroupedTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupedTopKStrategy
  }

  /** Each group's top-k rows by `scoreCol` desc, `tieCol` asc — the
    * grouped-top-k operator above; original schema preserved.
    */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val node = GroupedTopK(
      groupCols.map(attr),
      Cast(attr(scoreCol), DoubleType),
      Cast(attr(tieCol), LongType),
      k, analyzed)
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }
}
