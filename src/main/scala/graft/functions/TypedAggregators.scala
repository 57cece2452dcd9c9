package graft.functions

import graft.streaming.Event
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Running argmax state: best (value, event_id) seen so far. */
case class ArgMaxState(value: Double, eventId: Long)

/** Typed `Aggregator` (Dataset API): per-group argmax — the event with the
  * highest `value`, ties broken toward the smaller event_id (deterministic
  * for the oracle). The typed-aggregation analog of the reference's
  * ORDER BY ... DESC LIMIT 1 argmax (SURVEY.md §2.4), usable with
  * `groupByKey(...).agg(ArgMaxEvent.toColumn)`.
  *
  * Scale: constant-size state per group with map-side partial merge — the
  * same shuffle shape as min/max, nothing like the sort the reference's
  * form implies.
  */
object ArgMaxEvent extends Aggregator[Event, ArgMaxState, Long] {

  private def better(a: ArgMaxState, b: ArgMaxState): ArgMaxState =
    if (a.value > b.value || (a.value == b.value && a.eventId < b.eventId)) a else b

  override def zero: ArgMaxState = ArgMaxState(Double.NegativeInfinity, Long.MaxValue)
  override def reduce(b: ArgMaxState, e: Event): ArgMaxState =
    better(b, ArgMaxState(e.value, e.event_id))
  override def merge(a: ArgMaxState, b: ArgMaxState): ArgMaxState = better(a, b)
  override def finish(b: ArgMaxState): Long = b.eventId
  override def bufferEncoder: Encoder[ArgMaxState] = Encoders.product[ArgMaxState]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Latest-row state for CDC compaction: the newest (ts, event_id, value)
  * seen so far, ties on the timestamp broken toward the LARGER event_id
  * (the change-log convention: later sequence number wins).
  */
case class LatestState(tsUs: Long, eventId: Long, value: Double)

/** Typed `Aggregator`: latest row per group — the CDC/upsert compaction
  * primitive. A declarative max(struct(...)) computes the same thing but
  * Spark plans it as SortAggregate (struct buffers aren't hash-mutable),
  * sorting every partition's raw change-log by key first; this typed
  * aggregator runs as ObjectHashAggregate — constant per-group state,
  * map-side combine, NO sort anywhere below the final presentation
  * ORDER BY. The shuffle carries one compacted row per key per mapper.
  */
object LatestEvent extends Aggregator[Event, LatestState, LatestState] {

  private[graft] def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos.toLong / 1000L

  // shared with the streaming counterpart (EventStreams.latestByKey) so
  // batch and stream can never disagree on the tie rule
  private[graft] def later(a: LatestState, b: LatestState): LatestState =
    if (a.tsUs > b.tsUs || (a.tsUs == b.tsUs && a.eventId > b.eventId)) a else b

  override def zero: LatestState = LatestState(Long.MinValue, Long.MinValue, 0.0)
  override def reduce(b: LatestState, e: Event): LatestState =
    later(b, LatestState(micros(e.ts), e.event_id, e.value))
  override def merge(a: LatestState, b: LatestState): LatestState = later(a, b)
  override def finish(b: LatestState): LatestState = b
  override def bufferEncoder: Encoder[LatestState] = Encoders.product[LatestState]
  override def outputEncoder: Encoder[LatestState] = Encoders.product[LatestState]
}
