package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, String, Long)], window: Long = 100L) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts")
    Funnel.conversion(df, "user_id", "event_type", "ts", stages, window)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
  }

  test("ordered completion, out-of-order, and window expiry") {
    val out = run(Seq(
      // u1 completes: view@10, click@50, purchase@120 (each gap <= 100)
      (1L, "view", 10L), (1L, "click", 50L), (1L, "purchase", 120L),
      // u2 purchase BEFORE click: sequence is view,purchase,click → stops at click
      (2L, "view", 10L), (2L, "purchase", 20L), (2L, "click", 30L),
      // u3 click arrives 200 after view: window (100) expired → stage 1 only
      (3L, "view", 10L), (3L, "click", 210L),
      // u4 never views: clicks alone don't enter the funnel
      (4L, "click", 10L)))
    assert(out.toSeq === Seq(
      (1L, "view", 3L, 1.0),
      (2L, "click", 2L, 2.0 / 3.0),
      (3L, "purchase", 1L, 1.0 / 3.0)))
  }

  test("same-timestamp tie consumes the earlier stage first") {
    // view and click at the same instant: view is accepted first (stage
    // ascending on ties), then the click advances the funnel at zero gap.
    val out = run(Seq((1L, "view", 10L), (1L, "click", 10L)))
    assert(out.toSeq === Seq((1L, "view", 1L, 1.0), (2L, "click", 1L, 1.0)))
  }

  test("repeat stages neither advance nor reset") {
    val out = run(Seq(
      (1L, "view", 0L), (1L, "view", 40L), (1L, "click", 90L),
      // second view at 40 must NOT refresh the entry: click at 90 is within
      // 100 of view@0 anyway; purchase at 250 is beyond 100 of click@90.
      (1L, "purchase", 250L)))
    assert(out.toSeq === Seq((1L, "view", 1L, 1.0), (2L, "click", 1L, 1.0)))
  }

  test("transitionMatrix: consecutive pairs per user, exact counts and probs") {
    import spark.implicits._
    val df = Seq(
      // u1: a→b→a ; u2: a→b ; u3: a alone (no transition)
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 5L, 4L), (2L, "b", 6L, 5L),
      (3L, "a", 1L, 6L)).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitionMatrix(df, "user_id", "event_type", Seq("ts", "event_id"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("a", "b")) === ((2L, 2L, 1.0)))
    assert(out(("b", "a")) === ((1L, 1L, 1.0)))
    assert(out.size === 2)
  }

  test("transitionMatrix: ties resolved by the tie-break column, probs sum to 1") {
    import spark.implicits._
    val df = Seq(
      // same ts: event_id orders x→y→z
      (1L, "x", 10L, 1L), (1L, "y", 10L, 2L), (1L, "z", 10L, 3L),
      (2L, "x", 10L, 4L), (2L, "z", 10L, 5L)).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitionMatrix(df, "user_id", "event_type", Seq("ts", "event_id"))
    val fromX = out.filter("from_type = 'x'").collect()
      .map(r => (r.getString(1), r.getDouble(4))).toMap
    assert(fromX === Map("y" -> 0.5, "z" -> 0.5))
  }

  test("pathPlausibility: common paths outscore rare ones, exact fp means") {
    import spark.implicits._
    def ns(min: Long) = (min + 1) * 60L * 1000000000L
    // 3 single-session users: two walk a→b, one walks a→c
    val events = Seq(
      (1L, 1L, ns(0), "a"), (2L, 1L, ns(1), "b"),
      (3L, 2L, ns(0), "a"), (4L, 2L, ns(1), "b"),
      (5L, 3L, ns(0), "a"), (6L, 3L, ns(1), "c"),
      (7L, 4L, ns(0), "solo") // single event — no transitions, absent
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Funnel.pathPlausibility(events, gapMinutes = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        ((r.getAs[Long]("n_trans"), r.getAs[Long]("path_fp")))).toMap
    // c(a→b)=2, c(a→c)=1, c(a→*)=3
    val pAB = 2L * 1048576L / 3L
    val pAC = 1048576L / 3L
    assert(out((1L, 1L)) === ((1L, pAB)))
    assert(out((2L, 1L)) === ((1L, pAB)))
    assert(out((3L, 1L)) === ((1L, pAC)))
    assert(!out.keySet.exists(_._1 == 4L))
    // a session split by a >30min gap scores its halves independently
    val gapped = Seq(
      (1L, 9L, ns(0), "a"), (2L, 9L, ns(1), "b"),
      (3L, 9L, ns(60), "a"), (4L, 9L, ns(61), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val g = Funnel.pathPlausibility(gapped, gapMinutes = 30).collect()
    assert(g.length === 2)
    assert(g.forall(_.getAs[Long]("n_trans") === 1L))
  }
}
