package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running totals on the transformWithState API — Spark 4's
  * arbitrary-state successor to mapGroupsWithState (StatefulSessions
  * covers the classic API). State is a single typed ValueState per key,
  * merged incrementally per micro-batch; TTL-capable (pass a TTLConfig
  * to bound state lifetime — the knob the classic API lacks).
  *
  * Requires the RocksDB state store
  * (spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider):
  * transformWithState is built on its changelog/TTL machinery — which is
  * also the provider a 100 TB deployment wants, since state spills to
  * disk instead of living on the executor heap.
  */
case class RunningTotal(n_events: Long, sum_value: Double)
case class KeyedRunningTotal(key: Long, n_events: Long, sum_value: Double)

class RunningTotalProcessor[I](value: I => Double)
    extends StatefulProcessor[Long, I, KeyedRunningTotal] {
  @transient private var totals: ValueState[RunningTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[RunningTotal]("totals",
      Encoders.product[RunningTotal], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[I],
      timers: TimerValues): Iterator[KeyedRunningTotal] = {
    val prev = if (totals.exists()) totals.get() else RunningTotal(0L, 0.0)
    var n = prev.n_events
    var s = prev.sum_value
    rows.foreach { r => n += 1; s += value(r) }
    totals.update(RunningTotal(n, s))
    Iterator.single(KeyedRunningTotal(key, n, s))
  }
}

object StatefulTotals {
  def runningTotals[I](ds: Dataset[I], key: I => Long, value: I => Double)
      (implicit ie: Encoder[I]): Dataset[KeyedRunningTotal] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[KeyedRunningTotal] =
      Encoders.product[KeyedRunningTotal]
    ds.groupByKey(key)
      .transformWithState(new RunningTotalProcessor[I](value),
        TimeMode.None(), OutputMode.Update())
  }
}
