package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Whole-operator as-of join (SURVEY.md §2b "As-of join"; §7.3 custom
  * SparkStrategy candidate): for every left row, the right row with the
  * greatest rightTime <= leftTime within the same key, else nulls.
  *
  * Physical algorithm: both children are hash-clustered on the key (with a
  * pinned partition count so the two shuffles stay zip-compatible under
  * AQE) and sorted by (key, time); one streaming merge pass per partition
  * keeps exactly ONE buffered candidate row — O(|L|+|R|) time, O(1)
  * memory, no pair materialization and no window state. This is the
  * operator-level alternative to the union-window formulation in
  * graft.ops.AsOfJoin (which needs only built-ins); both are
  * differentially tested against each other and the DuckDB oracle.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // Output cardinality is exactly the left side's (every left row emits
  // one row); size is bounded by both children's bytes. Exposing this
  // keeps Catalyst from treating the node as a black box when other
  // operators (e.g. a subsequent broadcast-join decision) plan around it.
  override def maxRows: Option[Long] = left.maxRows
  override def stats: Statistics = Statistics(
    sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes,
    rowCount = left.stats.rowCount)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Pin the partition count so EnsureRequirements gives both children the
  // same layout and AQE cannot coalesce them asymmetrically.
  private def shufflePartitions: Int = conf.numShufflePartitions

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(shufflePartitions)),
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(shufflePartitions)))

  // Right tie-break: among equal (key, time), payload columns break ties
  // ascending, so "the last qualifier" is the deterministic lexicographic
  // max — matching the window/oracle formulations.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightPayload.map(p => SortOrder(p, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  private def timeAsLong(row: InternalRow, ordinal: Int,
                         dt: org.apache.spark.sql.types.DataType): Long = dt match {
    case TimestampType | TimestampNTZType | LongType => row.getLong(ordinal)
    case IntegerType | DateType => row.getInt(ordinal).toLong
    case other => throw new IllegalArgumentException(s"unsupported time type $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadOrds = rightPayload.map(p => right.output.indexWhere(_.exprId == p.exprId))
    val keyType = leftKey.dataType
    val lTimeType = leftTime.dataType
    val rTimeType = rightTime.dataType
    val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
    val payloadTypes = rightPayload.map(_.dataType)
    val numLeft = left.output.size
    val numPayload = rightPayload.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRow = new GenericInternalRow(numPayload)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val payloadProj = UnsafeProjection.create(
        payloadOrds.zip(payloadTypes).zip(rightPayload).map { case ((ord, dt), a) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(ord, dt, a.nullable)
        })
      // one buffered candidate: a stable copy of the latest right row at
      // or before the current left time for the current key
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      var candRight: InternalRow = null

      lIter.map { lRow =>
        if (lRow.isNullAt(lKeyOrd)) {
          project(joiner(lRow, nullRow))
        } else {
          val lk = lRow.get(lKeyOrd, keyType)
          val lt = timeAsLong(lRow, lTimeOrd, lTimeType)
          // advance the right side while it is behind (smaller key, or
          // same key with time <= left time); remember the last qualifier
          var advancing = true
          while (advancing && rNext != null) {
            if (rNext.isNullAt(rKeyOrd)) {
              rNext = if (rIter.hasNext) rIter.next() else null
            } else {
              val cmp = keyOrdering.compare(rNext.get(rKeyOrd, keyType), lk)
              if (cmp < 0) {
                rNext = if (rIter.hasNext) rIter.next() else null
              } else if (cmp == 0 && timeAsLong(rNext, rTimeOrd, rTimeType) <= lt) {
                candRight = rNext.copy()
                rNext = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            }
          }
          val matched = candRight != null &&
            keyOrdering.compare(candRight.get(rKeyOrd, keyType), lk) == 0
          project(joiner(lRow, if (matched) payloadProj(candRight) else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
