package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator custom plan: exact top-k rows per key without sorting
  * whole groups.
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(...)
  * .orderBy(...)) <= k`) shuffles EVERY row and fully sorts every
  * partition before discarding all but k per key. This operator keeps a
  * bounded k-heap per key and runs in two phases like partial
  * aggregation: a map-side pass prunes each partition to ≤k rows per key
  * BEFORE the exchange (shuffle volume drops from n to ≤ k·keys·
  * partitions), then a final pass on the key-clustered side merges. For
  * per-query ANN ranking (millions of candidates, k=10) the shuffle and
  * the sort both collapse.
  *
  * Registered through GraftExtensions (injectPlannerStrategy) and also
  * attachable per-session via TopKPerKey.install.
  */
final case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** @param flushRows memory bound for the map-side (partial) pass: once the
  *   heaps collectively retain this many rows, they are emitted downstream
  *   and cleared — emitting more than k rows per key from the partial pass
  *   is always safe because the final pass re-prunes after the exchange.
  *   The final pass never flushes (it must see every row of a key before
  *   emitting that key's top-k) but retains at most the rows it will
  *   output for its partition: k·distinctKeysInPartition — the same
  *   memory profile as a hash aggregate over the same keys.
  */
final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, partial: Boolean, flushRows: Long,
                                child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      // ord.lt(a, b) ⇔ a sorts before b (a is "better")
      val ord = GenerateOrdering.generate(order, child.output)
      // max-heap: head = worst kept row, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val bound = if (partial) flushRows else Long.MaxValue
      new Iterator[InternalRow] {
        private var kept = 0L
        private var finished = false
        private var drain: Iterator[InternalRow] = Iterator.empty
        private def flushHeaps(): Iterator[InternalRow] = {
          val rows = heaps.values.toVector
          heaps.clear(); kept = 0L
          rows.iterator.flatMap(_.iterator)
        }
        private def fill(): Unit =
          while (!drain.hasNext && !finished) {
            if (!iter.hasNext) { drain = flushHeaps(); finished = true }
            else {
              var flushed = false
              while (iter.hasNext && !flushed) {
                val row = iter.next()
                val key = keyProj(row)
                val heap = heaps.get(key) match {
                  case Some(h) => h
                  case None =>
                    val h = mutable.PriorityQueue.empty[InternalRow](ord)
                    heaps.put(key.copy(), h)
                    h
                }
                if (heap.size < k) { heap.enqueue(row.copy()); kept += 1 }
                else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
                if (kept >= bound) { drain = flushHeaps(); flushed = true }
              }
            }
          }
        override def hasNext: Boolean = { fill(); drain.hasNext }
        override def next(): InternalRow = { fill(); drain.next() }
      }
    }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans TopKPerKeyPlan as partial → exchange(keys) → final. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy
    with org.apache.spark.internal.Logging {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      // fail loudly on a MALFORMED conf value (a typo like "1e6" silently
      // falling back to the default is worse than an error); a bound
      // below k is a VALID-but-degenerate request (per-row flushing), so
      // clamp to k with a warning instead of breaking the query — a
      // working conf must not become a hard failure just because k grew
      val flushRows = SparkSession.getActiveSession
        .flatMap(s => Option(s.conf.get(TopKPerKey.PartialFlushRowsKey, null)))
        .map { v =>
          val n =
            try v.trim.toLong
            catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"${TopKPerKey.PartialFlushRowsKey} must be a long, got '$v'")
            }
          val floor = math.max(k, 1).toLong
          if (n < floor) {
            logWarning(s"${TopKPerKey.PartialFlushRowsKey} ($n) < k ($k); " +
              s"clamping to $floor — the partial heap must hold k rows")
            floor
          } else n
        }
        .getOrElse(TopKPerKey.DefaultPartialFlushRows)
      val planned = planLater(child)
      TopKPerKeyExec(keys, order, k, partial = false, Long.MaxValue,
        TopKPerKeyExec(keys, order, k, partial = true, flushRows, planned)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Map-side retained-row bound before a partial flush (see
    * TopKPerKeyExec.flushRows). */
  val PartialFlushRowsKey = "spark.graft.topk.partialFlushRows"
  val DefaultPartialFlushRows: Long = 1L << 20

  /** Opt-in switch for TopKRewriteRule: the automatic
    * row_number()<=k → TopKPerKey re-plan changes the query's memory
    * profile (bounded heaps instead of a spillable window sort), so it
    * must be requested explicitly. The TopKPerKey.perKey API is always
    * available regardless. */
  val RewriteEnabledKey = "spark.graft.topk.rewrite.enabled"

  /** Make the strategy available on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = strategies :+ TopKPerKeyStrategy
  }

  /** Top `k` rows per `keyCols` group, ordered by `orderCols`
    * ((name, ascending?) — include a tiebreaker column for deterministic
    * results). Output column set equals the input's; row order within the
    * result is unspecified (sort afterwards if needed).
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = GraftSqlBridge.analyzed(df)
    val attrByName = plan.output.map(a => a.name -> a).toMap
    def attr(n: String): Attribute = attrByName.getOrElse(n,
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name)}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), order, k, plan))
  }
}
