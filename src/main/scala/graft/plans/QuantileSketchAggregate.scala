package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_qsketch(value)` — a MERGEABLE quantile sketch with CONSTANT
  * per-group state, as a typed imperative aggregate over non-negative
  * BIGINT values (callers feed exact integer units, e.g. cents). Returns
  * the sketch itself: `ARRAY<STRUCT<b INT, cnt BIGINT>>` sorted by bucket
  * id ASC, one row per non-empty bucket.
  *
  * Bucketing is DDSketch-style log-linear, but integer-exact (no libm, so
  * another engine reproduces it bit-for-bit — the DuckDB oracle does):
  *
  *  - `v < 1`          → bucket 0 (representative 0)
  *  - `1 <= v < 32`    → bucket `v` (small values exact, representative v)
  *  - `v >= 32`        → let L = bit length of v (64 - nlz), s = the 4 bits
  *                       after the leading 1, i.e. `(v >> (L-5)) & 15`;
  *                       bucket `L*16 + s`. The bucket covers
  *                       `[(16+s)·2^(L-5), (17+s)·2^(L-5))`; its integer
  *                       midpoint representative `(33+2s)·2^(L-6)` is within
  *                       **1/32 ≈ 3.1% relative error** of every member.
  *
  * Bucket ids are monotone in v and disjoint across the three ranges
  * (v<32 → id<32; v>=32 → L>=6 → id>=96), so a cumulative-count walk in id
  * order answers rank queries. Max id = 64·16+15 = 1039 → state is one
  * flat `Array[Long](1040)` (~8 KB) per group REGARDLESS of group size:
  * the mergeable-sketch slot VERDICT r5 called out, vs `percentile()`'s
  * O(rows) sort state. Merge is element-wise add — commutative and
  * associative, so the result is identical under any partitioning/merge
  * order (QuantileSketchSpec pins this by property test).
  *
  * Unlike KLL/t-digest the summary is merge-order DETERMINISTIC, which is
  * what lets the driver hash-compare it against DuckDB; the price is a
  * fixed 3.1% relative-error bound instead of a tunable rank-error bound —
  * the right trade for an oracle-gated engine (same reasoning as
  * `graft_bottomk`'s deterministic bottom-k sample).
  */
case class QuantileSketchAggregate(
    valExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import QuantileSketchAggregate._

  override def prettyName: String = "graft_qsketch"
  override def children: Seq[Expression] = Seq(valExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (valExpr.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch expects BIGINT, got ${valExpr.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](NumBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = valExpr.eval(input)
    if (v != null) buf(bucketOf(v.asInstanceOf[Long])) += 1L
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

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAggregate =
    copy(valExpr = newChildren(0))
}

object QuantileSketchAggregate {
  /** Max bucket id is 64*16 + 15 = 1039. */
  val NumBuckets: Int = 1040

  val entryType: StructType = StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Integer-exact log-linear bucket id; see class scaladoc for the map. */
  def bucketOf(v: Long): Int =
    if (v < 1L) 0
    else if (v < 32L) v.toInt
    else {
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v)
      bitLen * 16 + ((v >>> (bitLen - 5)) & 15L).toInt
    }

  /** The bucket's integer representative (midpoint); exact inverse of
    * [[bucketOf]]'s ranges. Mirrored in SQL by both the Spark rank-walk
    * and the DuckDB oracle.
    */
  def midpointOf(b: Int): Long =
    if (b < 32) b.toLong
    else {
      val bitLen = b / 16
      val s = b % 16
      (33L + 2L * s) << (bitLen - 6)
    }

  // buffer codecs shared with graft_qsketch_merge (same state shape)

  def evalBuffer(buf: Array[Long]): GenericArrayData = {
    var n = 0
    var i = 0
    while (i < NumBuckets) { if (buf(i) != 0L) n += 1; i += 1 }
    val rows = new Array[Any](n)
    var j = 0
    i = 0
    while (i < NumBuckets) {
      if (buf(i) != 0L) { rows(j) = InternalRow(i, buf(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(rows)
  }

  def serializeBuffer(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var n = 0
    var i = 0
    while (i < NumBuckets) { if (buf(i) != 0L) n += 1; i += 1 }
    out.writeInt(n)
    i = 0
    while (i < NumBuckets) {
      if (buf(i) != 0L) { out.writeInt(i); out.writeLong(buf(i)) }
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  def deserializeBuffer(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](NumBuckets)
    val n = in.readInt()
    var i = 0
    while (i < n) { val b = in.readInt(); buf(b) = in.readLong(); i += 1 }
    buf
  }
}
