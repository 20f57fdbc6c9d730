package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom plan #2: the AS-OF join — for every left row,
  * the single latest right row of the same key whose timestamp is ≤ the
  * left row's (pandas merge_asof / kdb aj semantics). Spark has no such
  * operator; the declarative workaround unions both sides and computes a
  * running max over a window (JoinQueries "q_join_asof"), which buffers
  * and sorts the merged stream and can only carry ONE value column
  * through the running aggregate.
  *
  * This operator plans like a sort-merge join: both sides hash-cluster
  * on the key and sort by (key, ts) — the exchanges come from
  * `requiredChildDistribution`, the sorts from `requiredChildOrdering`,
  * so AQE/EnsureRequirements own the physical arrangement — and each
  * partition pair then streams ONE forward merge: the right cursor never
  * rewinds, memory holds one candidate row (the latest match so far),
  * and the whole right payload row rides along (any number of columns,
  * unlike the window trick). Unmatched left rows emit nulls on the
  * right (left-outer as-of).
  *
  * Null timestamps AND null keys follow SQL comparison semantics: a
  * null on either side never matches (SQL equality never equates nulls,
  * unlike the natural row ordering the merge uses internally — null
  * keys are checked explicitly).
  */
final case class AsOfJoinPlan(leftKeys: Seq[Expression],
                              rightKeys: Seq[Expression],
                              leftTs: Expression, rightTs: Expression,
                              left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  // the merge compares timestamps as raw longs (micros for TimestampType)
  private val tsTypes: Set[org.apache.spark.sql.types.DataType] = Set(
    org.apache.spark.sql.types.TimestampType, org.apache.spark.sql.types.LongType)
  require(tsTypes.contains(leftTs.dataType) && rightTs.dataType == leftTs.dataType,
    s"as-of ts columns must both be timestamp or long, got " +
      s"${leftTs.dataType.catalogString}/${rightTs.dataType.catalogString}")
  // mismatched key dtypes would hash equal values to different partitions
  // AND make the ordering read the wrong byte layout — silently-wrong
  // output, so reject up front like the ts types
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key dtype mismatch: ${l.dataType.catalogString} vs " +
        s"${r.dataType.catalogString} — cast one side first")
  }
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(leftKeys: Seq[Expression],
                              rightKeys: Seq[Expression],
                              leftTs: Expression, rightTs: Expression,
                              left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // right cursor: current un-consumed right row (copied — sorter
        // iterators reuse row buffers) and its key
        private var rRow: InternalRow = null
        private var rKey: UnsafeRow = null
        private def advanceRight(): Unit = {
          rRow = null; rKey = null
          // SQL equality never matches null keys; skip them here (loop,
          // not recursion — a run of null-keyed rows must not grow the
          // stack) so the merge only ever compares fully-defined keys
          var searching = true
          while (searching && ri.hasNext) {
            val candidate = ri.next()
            val k = rKeyProj(candidate)
            if (!k.anyNull) {
              rRow = candidate.copy()
              rKey = k.copy()
              searching = false
            }
          }
        }
        advanceRight()

        // latest right row with rts <= current left ts for the current key
        private var matchRow: InternalRow = null
        private var matchKey: UnsafeRow = null

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lKey = lKeyProj(l).copy()
          if (lKey.anyNull) {
            // null left key matches nothing (SQL equality semantics);
            // the right cursor stays put for later left rows
            return resultProj(joined(l, nullRight))
          }
          if (matchKey != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchRow = null; matchKey = null
          }
          val lTsRow = lTsProj(l)
          if (lTsRow.isNullAt(0)) {
            // null left ts matches nothing, but the cursor must NOT be
            // advanced past rows later left rows may need
            return resultProj(joined(l, nullRight))
          }
          val lTs = lTsRow.getLong(0)
          var done = false
          while (!done && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight() // right side behind this key
            else if (c > 0) done = true // right side ahead; keep for later
            else {
              val rTsRow = rTsProj(rRow)
              if (rTsRow.isNullAt(0)) advanceRight() // null rts: no match
              else if (rTsRow.getLong(0) <= lTs) {
                matchRow = rRow; matchKey = lKey
                advanceRight()
              } else done = true // future right rows match later left rows
            }
          }
          resultProj(joined(l, if (matchRow != null) matchRow else nullRight))
        }
      }
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan as the merge exec (exchanges/sorts come from the
  * exec's required distribution/ordering).
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lts, rts, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Make the strategy available on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
  }

  /** As-of join `left` to `right`: for each left row, the latest right
    * row with equal `keyCols` and `rightTsCol` ≤ `leftTsCol`; unmatched
    * left rows keep nulls on the right side. Column names must be
    * disjoint between the two sides (rename before joining) so the
    * result is unambiguous.
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKeyCols: Seq[String], rightKeyCols: Seq[String],
           leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"asOf: rename overlapping columns first: ${overlap.mkString(", ")}")
    val lp = GraftSqlBridge.analyzed(left)
    val rp = GraftSqlBridge.analyzed(right)
    // resolve names the way the session does (case-insensitive by
    // default, case-sensitive under spark.sql.caseSensitive) instead of
    // a hard-coded exact match — asOf(df, ..., "TS") must behave like
    // df.select("TS"). Ambiguity under the resolver is an error, not a
    // silent first-match.
    val resolver = spark.sessionState.conf.resolver
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: matches ${many.map(_.name)}")
      }
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      leftKeyCols.map(attr(lp, _)), rightKeyCols.map(attr(rp, _)),
      attr(lp, leftTsCol), attr(rp, rightTsCol), lp, rp))
  }
}
