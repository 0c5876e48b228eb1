package graft.streaming

import graft.streaming.EventStream.Event
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing on the Spark 4 `transformWithState` API —
  * the successor to `flatMapGroupsWithState` with NAMED, independently
  * typed state variables (value/list/map), per-state TTL, and timers.
  *
  * The operator here is a per-user running profile: total event count,
  * value sum, and the set of distinct event types seen — a ValueState for
  * the totals plus a MapState used as a set for the types. Each
  * micro-batch emits one updated row per user present in the batch
  * (append mode), i.e. a streaming changelog of the user profile.
  *
  * Scale shape: state is partitioned by user (high cardinality); the type
  * set is bounded by |event types|, so per-key state is O(1)-ish; the
  * RocksDB state store (REQUIRED by this API) spills per-partition state
  * off-heap, so total state is bounded by disk, not executor memory. The
  * value sum keeps the per-user ARRIVAL fold order — deterministic under
  * replay from a checkpoint (same micro-batch contents), which is the
  * streaming determinism contract (batch oracles for sums use decimal).
  */
object StatefulOps {

  /** One changelog row of the running per-user profile. */
  final case class UserProfile(user_id: Long, n_events: Long,
                               sum_value: Double, distinct_types: Long)

  /** Running totals in a ValueState + seen-type set in a MapState.
    * State TTL is off (NONE): the profile is cumulative by design; pass a
    * TTL to expire dormant users' state instead.
    */
  private final class ProfileProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Event, UserProfile] {
    @transient private var totals: ValueState[(Long, Double)] = _
    @transient private var seen: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)
      seen = getHandle.getMapState[String, Boolean]("seen",
        Encoders.STRING, Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserProfile] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e =>
        n += 1; s += e.value
        if (!seen.containsKey(e.event_type)) seen.updateValue(e.event_type, true)
      }
      totals.update((n, s))
      Iterator.single(UserProfile(userId, n, s, seen.keys().size.toLong))
    }
  }

  /** Per-user running profile changelog over a streaming (or batch)
    * Dataset of events. Requires the RocksDB state store provider when
    * streaming ([[withRocksDbStateStore]]).
    */
  def runningProfile(events: Dataset[Event],
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(ttl), TimeMode.None(),
        OutputMode.Append())
  }

  /** The `transformWithState` operator family only runs on the RocksDB
    * state store; set this session conf before starting the query.
    */
  def withRocksDbStateStore(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
