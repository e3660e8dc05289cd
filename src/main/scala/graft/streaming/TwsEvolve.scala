package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** State SCHEMA EVOLUTION on `transformWithState` — the operational move
  * a long-lived production pipeline eventually needs: v2 of the job adds
  * a field to its per-key state WITHOUT discarding the checkpoint (a
  * 100 TB deployment cannot replay months of input to rebuild state).
  *
  * The mechanics: under the default unsaferow state encoding, state
  * values are raw byte layouts — any schema change is rejected at
  * restart (`STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE`). Under the AVRO
  * encoding (`spark.sql.streaming.stateStore.encodingFormat = avro`,
  * pinned into the checkpoint at first start — see
  * [[StateBackend.usingAvro]]), Spark stores the writer schema alongside
  * the state and resolves old records against the new reader schema by
  * Avro's own evolution rules: new fields must be NULLABLE (they read as
  * null for pre-evolution keys), dropped fields are ignored, and
  * compatible widenings resolve. That is why [[AggV2]]'s added maximum
  * is an `Option[Long]` — `None` IS the honest value for state written
  * before the field existed: the running max over rows v1 never saw is
  * unknowable, and any numeric default would be a lie.
  *
  * The pair of processors shares one state variable name (`"agg"`), so
  * a v2 restart on a v1 checkpoint reads v1's records through the
  * evolved schema; TwsEvolveSpec drives exactly that restart (and the
  * unsaferow rejection twin) on a RocksDB checkpoint.
  */
object TwsEvolve {

  /** v1 per-user state: row count and value sum. */
  case class AggV1(n: Long, sum: Long)

  /** v2 state: v1 plus a running maximum — `None` for keys whose state
    * predates the field (the pre-evolution max is unknowable).
    */
  case class AggV2(n: Long, sum: Long, maxV: Option[Long])

  case class OutV1(userId: Long, n: Long, sum: Long)

  /** v2 output; `max_known` is false while the key's max is still the
    * pre-evolution unknown (no post-evolution row seen yet).
    */
  case class OutV2(userId: Long, n: Long, sum: Long, maxV: Long,
      maxKnown: Boolean)

  class V1Processor extends StatefulProcessor[Long, (Long, Long), OutV1] {

    @transient private var agg: ValueState[AggV1] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[AggV1]("agg", Encoders.product[AggV1],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[OutV1] = {
      var cnt = 0L
      var s = 0L
      rows.foreach { r => cnt += 1; s += r._2 }
      val prev = if (agg.exists()) agg.get() else AggV1(0L, 0L)
      val nv = AggV1(prev.n + cnt, prev.sum + s)
      agg.update(nv)
      Iterator.single(OutV1(user, nv.n, nv.sum))
    }
  }

  class V2Processor extends StatefulProcessor[Long, (Long, Long), OutV2] {

    @transient private var agg: ValueState[AggV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[AggV2]("agg", Encoders.product[AggV2],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[OutV2] = {
      var cnt = 0L
      var s = 0L
      var bMax = Long.MinValue
      rows.foreach { r =>
        cnt += 1; s += r._2
        if (r._2 > bMax) bMax = r._2
      }
      val prev = if (agg.exists()) agg.get() else AggV2(0L, 0L, None)
      val nMax = prev.maxV match {
        case Some(m) if cnt == 0 => Some(m)
        case Some(m) => Some(math.max(m, bMax))
        case None if cnt == 0 => None
        case None => Some(bMax)
      }
      val nv = AggV2(prev.n + cnt, prev.sum + s, nMax)
      agg.update(nv)
      Iterator.single(OutV2(user, nv.n, nv.sum, nv.maxV.getOrElse(-1L),
        nv.maxV.isDefined))
    }
  }

  /** v1 of the running per-user aggregate (count + sum). Start under
    * [[StateBackend.usingAvro]] if the state is ever meant to evolve —
    * the encoding is pinned at FIRST start.
    */
  def aggV1(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select($"user_id", $"v")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState[OutV1](new V1Processor, TimeMode.None,
        OutputMode.Update)
      .toDF()
  }

  /** v2: same state variable, evolved schema (adds the running max). */
  def aggV2(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select($"user_id", $"v")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState[OutV2](new V2Processor, TimeMode.None,
        OutputMode.Update)
      .toDF()
  }
}
