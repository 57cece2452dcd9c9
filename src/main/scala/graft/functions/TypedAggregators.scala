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
