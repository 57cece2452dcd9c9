package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_qsketch_merge(sketch)` — re-aggregates ALREADY-BUILT
  * [[QuantileSketchAggregate]] sketches (`ARRAY<STRUCT<b INT, cnt BIGINT>>`)
  * into one: per input sketch, add its bucket counts into the buffer.
  *
  * This is the half of the mergeable-sketch contract that makes it worth
  * having at 100 TB: sketch ONCE per fine partition at ingest (per day ×
  * source, per (flag, status), ...), persist the ~8 KB summaries, and
  * answer any coarser rollup later by merging summaries — never re-reading
  * the raw rows. Because the bucket map is fixed and merge is element-wise
  * addition, a rollup of per-group sketches is BIT-IDENTICAL to sketching
  * the union raw (`q_percentiles_rollup` oracle-checks exactly that;
  * QuantileSketchSpec pins it as a property).
  *
  * Shares buffer/serialize/eval shape with [[QuantileSketchAggregate]];
  * the only difference is update() consuming a sketch array instead of a
  * scalar.
  */
case class QuantileSketchMergeAggregate(
    sketchExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import QuantileSketchAggregate._

  override def prettyName: String = "graft_qsketch_merge"
  override def children: Seq[Expression] = Seq(sketchExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = sketchExpr.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 && s(0).dataType == IntegerType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_merge expects ARRAY<STRUCT<b INT, cnt BIGINT>>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](NumBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = sketchExpr.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        val e = a.getStruct(i, 2)
        buf(e.getInt(0)) += e.getLong(1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumBuckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = QuantileSketchAggregate.evalBuffer(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    QuantileSketchAggregate.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    QuantileSketchAggregate.deserializeBuffer(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMergeAggregate =
    copy(sketchExpr = newChildren(0))
}
