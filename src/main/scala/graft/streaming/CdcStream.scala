package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC compaction — the live twin of
  * [[graft.ops.Cdc.latestSnapshot]] (batch oracle q169): maintain the
  * latest-wins state per key as the change log arrives, emitting the
  * current row (or its tombstone) for every key touched in a batch.
  *
  * Latest-wins is decided by (ts, seq), NOT by arrival order: a straggler
  * older than the stored version bumps the op count but never regresses
  * the value — so the state converges to exactly the batch operator's
  * answer under any delivery order (spec-proved). Deletes are kept as
  * explicit tombstones (`deleted = true`) rather than dropped state: a
  * downstream sink needs the retraction, and a late pre-delete update
  * must still lose to the delete's (ts, seq).
  *
  * State per key is one fixed-size record; no timeout — CDC keys live as
  * long as the table does. Run with the RocksDB state store provider when
  * the key space exceeds executor heap.
  */
object CdcStream {

  case class CdcState(tsUs: Long, seq: Long, value: Double, deleted: Boolean, nOps: Long)
  case class CdcOut(
      key: Long, value: Double, lastTsUs: Long, nOps: Long, deleted: Boolean)

  /** `events` needs columns (key: long, ts_us: long, seq: long,
    * op: string — 'D' deletes, anything else upserts, value: double).
    * Output mode: Update (one row per touched key per batch).
    */
  def latestState(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("key", "ts_us", "seq", "op", "value")
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[CdcState]) =>
          var st = state.getOption
            .getOrElse(CdcState(Long.MinValue, Long.MinValue, 0.0, deleted = true, 0L))
          rows.foreach { case (_, ts, seq, op, v) =>
            val newer = ts > st.tsUs || (ts == st.tsUs && seq > st.seq)
            st =
              if (newer) CdcState(ts, seq, v, op == "D", st.nOps + 1)
              else st.copy(nOps = st.nOps + 1)
          }
          state.update(st)
          CdcOut(key, st.value, st.tsUs, st.nOps, st.deleted)
      }
      .toDF()
  }
}
