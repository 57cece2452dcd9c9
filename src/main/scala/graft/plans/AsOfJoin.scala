package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join (point-in-time join): for every left row, the single right row
  * with the same key and the greatest `ts` not after the left row's `ts` —
  * the feature-store / market-data operator Spark's DataFrame API lacks.
  *
  * This is the full custom-operator rung of the extension ladder
  * ([[AsOfJoinPlan]] logical node → [[AsOfJoinStrategy]] →
  * [[AsOfJoinExec]] physical merge, wired by [[GraftExtensions]]):
  * the composed alternative (union/window or range-join + argmax) either
  * shuffles the fat right rows through a window or explodes the range pair
  * space; this operator co-partitions both sides by key, sorts by
  * (key, ts) — Spark inserts exactly one exchange+sort per side — and then
  * streams BOTH sorted sides in one O(n+m) merge pass per partition with a
  * single retained right row. 100 TB posture: no pair blow-up, no window
  * buffer, partition-local state = one row. (Measured ~1.5× the composed
  * union+window form at sf0.1 with identical output; the composed form
  * additionally sorts left+right TOGETHER through one window, so the gap
  * widens with volume.)
  *
  * Inner semantics by default: left rows with no at-or-before match are
  * dropped (DuckDB's `ASOF JOIN` — the oracle — matches); `leftOuter=true`
  * keeps them with a null right side (`ASOF LEFT JOIN`). `forward=true`
  * matches the EARLIEST right row at-or-after instead; `toleranceUs` bounds
  * the allowed time distance (unbounded when negative). Keys and timestamps must
  * be BIGINT (epoch-micros); on ties in right `ts` the last row in
  * (key, ts) sort order wins, so make (key, ts) unique on the right for
  * determinism.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    leftOuter: Boolean = false,
    forward: Boolean = false,
    toleranceUs: Long = -1L)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts, outer, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, outer, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    leftOuter: Boolean = false,
    forward: Boolean = false,
    toleranceUs: Long = -1L)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // StatefulOpClusteredDistribution pins EXACT hash partitioning with a
  // fixed partition count on both sides (the guarantee streaming stateful
  // ops use), so the children are co-partitioned 1:1 and AQE cannot
  // coalesce them out of alignment under our zipPartitions.
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    StatefulOpClusteredDistribution(Seq(leftKey), conf.numShufflePartitions),
    StatefulOpClusteredDistribution(Seq(rightKey), conf.numShufflePartitions))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val schema = output
    val rightWidth = right.output.length
    val outer = leftOuter
    val fwd = forward
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema, schema)
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var held: InternalRow = null // latest right row already consumed
      var heldKey = 0L
      var heldValid = false

      lIter.flatMap { lRow =>
        val keyV = lk.eval(lRow)
        val tsV = lt.eval(lRow)
        if (keyV == null || tsV == null) {
          // null never matches; left-outer still emits the left row
          if (outer) Iterator.single(project(joined(lRow, nullRight))) else Iterator.empty
        } else {
          val key = keyV.asInstanceOf[Long]
          val ts = tsV.asInstanceOf[Long]
          // backward: advance right through every row at-or-before (key, ts),
          // remembering the last matching-key row. forward: advance right
          // past rows strictly before (key, ts); the head (if key-matching)
          // is the earliest at-or-after row and is NOT consumed, so later
          // left rows can match it too.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hkV = rk.eval(head)
            val htV = rt.eval(head)
            if (hkV == null || htV == null) {
              rBuf.next() // null-keyed right row matches nothing; NULLS FIRST
            } else {
              val hk = hkV.asInstanceOf[Long]
              val ht = htV.asInstanceOf[Long]
              if (hk < key || (hk == key && (if (fwd) ht < ts else ht <= ts))) {
                if (!fwd && hk == key) { held = rBuf.next().copy(); heldKey = hk; heldValid = true }
                else rBuf.next() // right-only key / passed-by forward row
              } else advancing = false
            }
          }
          val matched: InternalRow =
            if (fwd) {
              if (rBuf.hasNext) {
                val head = rBuf.head
                val hkV = rk.eval(head)
                val htV = rt.eval(head)
                if (hkV != null && htV != null &&
                    hkV.asInstanceOf[Long] == key &&
                    (tol < 0 || htV.asInstanceOf[Long] - ts <= tol)) head else null
              } else null
            } else {
              if (heldValid && heldKey == key &&
                  (tol < 0 || ts - rt.eval(held).asInstanceOf[Long] <= tol)) held else null
            }
          if (matched != null) {
            Iterator.single(project(joined(lRow, matched)))
          } else if (outer) {
            Iterator.single(project(joined(lRow, nullRight)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoin(left, "k", "ts", right, "k2", "ts2")`. */
object AsOfJoin {
  def apply(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      leftOuter: Boolean = false,
      forward: Boolean = false,
      toleranceUs: Long = -1L): DataFrame = {
    val spark: SparkSession = left.sparkSession
    GraftExtensions.ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side column '$name' not found"))
    val (lk, lt) = (attr(lp, leftKey, "left"), attr(lp, leftTs, "left"))
    val (rk, rt) = (attr(rp, rightKey, "right"), attr(rp, rightTs, "right"))
    Seq(lk, lt, rk, rt).foreach { a =>
      require(a.dataType == LongType,
        s"as-of join key/ts columns must be BIGINT, got ${a.name}: ${a.dataType.catalogString}")
    }
    require(lp.output.map(_.name).intersect(rp.output.map(_.name)).isEmpty,
      "as-of join requires disjoint column names; rename before joining")
    GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, lk, lt, rk, rt, leftOuter, forward, toleranceUs))
  }
}
