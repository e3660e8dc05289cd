package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, MapState}

/** Running per-(user, event_type) counts on `transformWithState`'s
  * MapState — the CDC-count shape: every micro-batch emits the REVISED
  * cumulative count for each (user, type) the batch touched, so a
  * downstream upsert sink always holds the current totals.
  *
  * Why MapState and not one ValueState[Map]: with the default blob
  * state a per-user map is one opaque value — every touch deserializes
  * and rewrites ALL of a user's types. MapState makes each (user, type)
  * its own RocksDB entry: a batch that touches one type reads and
  * writes one entry, so per-batch state I/O is O(types touched), not
  * O(types ever seen) — the difference between a hot user costing a
  * point lookup and costing a full-profile rewrite at 100 TB fan-in.
  *
  * TwsCountsSpec proves the incremental totals equal the batch
  * `groupBy(user, type).count()` on the same rows (cross-batch
  * accumulation included) and that the state really lives in RocksDB.
  */
object TwsCounts {

  case class TypeCountOut(userId: Long, eventType: String, n: Long)

  class TypeCountProcessor
      extends StatefulProcessor[Long, (Long, String), TypeCountOut] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[TypeCountOut] = {
      // fold the batch locally first: one state read + write per type
      // TOUCHED, however many rows arrived
      val batch = rows.foldLeft(Map.empty[String, Long]) {
        case (m, (_, t)) => m.updated(t, m.getOrElse(t, 0L) + 1)
      }
      // materialize eagerly (state writes must not hide inside a lazy
      // iterator) and emit in sorted-type order for deterministic output
      val out = batch.toSeq.sortBy(_._1).map { case (t, add) =>
        val nv = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + add
        counts.updateValue(t, nv)
        TypeCountOut(user, t, nv)
      }
      out.iterator
    }
  }

  /** The running-count stream: Update-mode emissions of revised
    * (user_id, event_type, n) totals. Requires the RocksDB state-store
    * provider at query START (wrap in `StateBackend.using`).
    */
  def typeCountsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select($"user_id", $"event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState[TypeCountOut](
        new TypeCountProcessor, TimeMode.None, OutputMode.Update)
      .toDF()
  }

  /** [[TypeCountProcessor]] with STATE BOOTSTRAP: before the first batch,
    * each key's rows from a batch-computed initial frame seed the
    * MapState — the production migration path (cut a new streaming query
    * over from a batch-maintained table WITHOUT reprocessing history).
    * handleInitialState is invoked once per initial-state row's key on
    * the first micro-batch; input rows then accumulate on top.
    */
  class SeededTypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, String), TypeCountOut, (Long, String, Long)] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(
        user: Long, row: (Long, String, Long), timers: TimerValues): Unit =
      counts.updateValue(row._2, row._3)

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[TypeCountOut] = {
      val batch = rows.foldLeft(Map.empty[String, Long]) {
        case (m, (_, t)) => m.updated(t, m.getOrElse(t, 0L) + 1)
      }
      val out = batch.toSeq.sortBy(_._1).map { case (t, add) =>
        val nv = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + add
        counts.updateValue(t, nv)
        TypeCountOut(user, t, nv)
      }
      out.iterator
    }
  }

  /** [[typeCountsTws]] seeded from a batch frame of
    * (user_id, event_type, n) totals — the state-bootstrap shape.
    */
  def typeCountsTwsSeeded(spark: SparkSession, events: DataFrame,
      initial: DataFrame): DataFrame = {
    import spark.implicits._
    val init = initial
      .select($"user_id", $"event_type", $"n")
      .as[(Long, String, Long)]
      .groupByKey(_._1)
    events
      .select($"user_id", $"event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState[TypeCountOut, (Long, String, Long)](
        new SeededTypeCountProcessor, TimeMode.None, OutputMode.Update, init)
      .toDF()
  }
}
