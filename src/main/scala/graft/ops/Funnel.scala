package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed funnel analysis — how far through an ordered stage sequence
  * (e.g. view → click → purchase) each user progressed, where every next
  * stage must occur within `window` time units of the PREVIOUS accepted
  * stage event.
  *
  * Algorithm: one hash shuffle groups each user's stage events; the per-user
  * event list is sorted by (ts, stage) and folded left with the accumulator
  * "last accepted event" (sentinel: stage 0). An event advances the funnel
  * iff its stage is exactly acc.stage+1 and it lands within the window of
  * acc.ts. This is the sequential-match semantics of ClickHouse's
  * windowFunnel, chained from the previous stage rather than the entry
  * event, and it is deterministic: ties in ts resolve by stage ascending,
  * so the earlier stage is consumed first.
  *
  * Scale: ONE shuffle on the user key with map-side projection to (ts,
  * stage-index) structs; the fold is a codegen'd array expression — no
  * iterative joins, no driver state. Per-user memory is the user's own
  * event count (the same bound any sessionization carries). The final
  * per-stage rollup is K rows.
  */
object Funnel {

  /** `tsCol` must be an integral event time; `window` is in the same units.
    * Returns one row per stage: stage_idx, stage, n_users (users reaching
    * at least that stage), conversion (fraction of stage-1 users).
    */
  def conversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      window: Long): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val stageIdx = stages.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
      }
    val perUser = events
      .withColumn("__stage", stageIdx)
      .filter(col("__stage").isNotNull)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).cast("long").as("ts"), col("__stage").as("stage")))).as("ss"))
      .select(
        col(userCol),
        aggregate(
          col("ss"),
          struct(lit(0L).as("ts"), lit(0).as("stage")),
          (acc, x) => when(
            x("stage") === acc("stage") + 1 &&
              (acc("stage") === 0 || x("ts") - acc("ts") <= lit(window)),
            x).otherwise(acc))
          .getField("stage").as("reached"))
    val names = array(stages.map(lit): _*)
    perUser
      .filter(col("reached") >= 1)
      .select(explode(sequence(lit(1), col("reached"))).as("stage_idx"))
      .groupBy(col("stage_idx"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        col("stage_idx").cast("long").as("stage_idx"),
        element_at(names, col("stage_idx")).as("stage"),
        col("n_users"),
        (col("n_users").cast("double") /
          max(col("n_users")).over(Window.partitionBy()).cast("double"))
          .as("conversion"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * count every consecutive (from_type → to_type) step, plus the row
    * total and transition probability — the journey-analytics companion
    * to [[conversion]] (which fixes a stage order; this discovers it).
    *
    * `orderCols` must make the per-key order total (e.g. ts + a unique
    * event id as tie-break), or the pair set is not well-defined.
    *
    * Scale: the `lead` window is ONE hash shuffle on the key — the same
    * shuffle sessionization already pays — and the count aggregate on
    * (from, to) has map-side partial combine. The probability window runs
    * over the K×K count table, not the data.
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val perKey = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val counts = events
      .withColumn("to_type", lead(col(typeCol), 1).over(perKey))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("prob", col("n").cast("double") / col("n_from").cast("double"))
      .select("from_type", "to_type", "n", "n_from", "prob")
  }

  /** Per-session path plausibility under the corpus' own session-level
    * Markov model — [[transitionMatrix]] turned into a detector: every
    * within-session transition a→b gets ⌊2²⁰·c(a→b)/c(a→*)⌋ and a session
    * scores the floor-mean over its transitions. Low scores are
    * improbable journeys (bots, broken instrumentation, attack scripts);
    * the same integer-fixed-point discipline as TextAnalysis'
    * lmPlausibility, over behavior instead of text. Single-event sessions
    * have no transitions and are absent by definition.
    *
    * Scale: sessionization's one shuffle on user, a K×K transition table
    * (broadcast back), and a per-session aggregate — the transition
    * stream never re-shuffles beyond the session key.
    */
  def pathPlausibility(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val sess = graft.streaming.Sessions.withSessionIds(events, gapMinutes)
    val w = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val steps = sess
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("session_idx"),
        col("event_type").as("from_type"), col("to_type"))
    val probs = steps.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"),
        graft.ext.ExactMath.floorDiv(col("n") * lit(1048576L), col("n_from")).as("p_fp"))
    steps.join(broadcast(probs), Seq("from_type", "to_type"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_trans"), sum(col("p_fp")).as("__s"))
      .select(col("user_id"), col("session_idx").cast("long").as("session_idx"),
        col("n_trans"),
        graft.ext.ExactMath.floorDiv(col("__s"), col("n_trans")).as("path_fp"))
  }
}
