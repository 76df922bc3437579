package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** First-touch funnel semantics on an enumerable fixture: out-of-order
  * events don't count, stages chain off the PREVIOUS stage's first
  * completion, same-instant events count as in-order, and the whole
  * computation is one key shuffle.
  */
class FunnelSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    val s2 = spark; import s2.implicits._
    Seq(
      // user 1: clean signup → click → purchase
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE signup (must not count), purchase after —
      // but no in-order click, so the purchase can't count either
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "purchase", 20L),
      // user 3: stalls after click
      (3L, "signup", 10L), (3L, "click", 20L),
      // user 4: purchase only — never entered the funnel
      (4L, "purchase", 5L),
      // user 5: signup and click at the SAME instant (>= counts it)
      (5L, "signup", 10L), (5L, "click", 10L)
    ).toDF("user_id", "event_type", "ts_us")
  }

  test("stage times chain strictly off the previous stage") {
    val times = Funnel.stageTimes(fixture, "user_id", "event_type", "ts_us",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (
        Option(r.getAs[java.lang.Long]("t_signup")),
        Option(r.getAs[java.lang.Long]("t_click")),
        Option(r.getAs[java.lang.Long]("t_purchase")))).toMap
    assert(times(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(times(2L) == ((Some(10L), None, None)), s"got ${times(2L)}")
    assert(times(3L) == ((Some(10L), Some(20L), None)))
    assert(times(4L) == ((None, None, None)))
    assert(times(5L) == ((Some(10L), Some(10L), None)))
  }

  test("counts and conversions collapse the stage times") {
    val rows = Funnel.counts(fixture, "user_id", "event_type", "ts_us",
        Seq("signup", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("signup", 4L, 1.0),      // users 1, 2, 3, 5
      ("click", 3L, 0.75),      // users 1, 3, 5
      ("purchase", 1L, 0.25)))  // user 1
  }

  test("cohort retention cells count distinct keys by period offset") {
    val s2 = spark; import s2.implicits._
    // period = 10: user 1 first at 5 (cohort 0), active periods 0,1,3;
    // user 2 first at 12 (cohort 1), active 1 and 2 (offset 0, 1);
    // user 3 first at 7 (cohort 0), active 0 only — twice (distinct!)
    val ev = Seq((1L, 5L), (1L, 15L), (1L, 35L), (1L, 16L),
      (2L, 12L), (2L, 25L), (3L, 7L), (3L, 9L))
      .toDF("user_id", "ts_us")
    val cells = Funnel.cohortRetention(ev, "user_id", "ts_us",
        periodUs = 10L, maxPeriods = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells == Map(
      (0L, 0) -> 2L, // users 1, 3 in cohort 0 at offset 0 (3 deduped)
      (0L, 1) -> 1L, // user 1 (events 15, 16 dedupe)
      (0L, 3) -> 1L, // user 1 at 35
      (1L, 0) -> 1L, (1L, 1) -> 1L), s"got $cells")
  }

  test("cohort boundaries FLOOR negative timestamps (DuckDB // parity)") {
    val s2 = spark; import s2.implicits._
    // pre-epoch events: -5 lies in period floor(-5/10) = -1, not DIV's 0.
    // user 1 first at -15 (cohort -2), active again at -5 (offset 1) and
    // 5 (offset 2, period 0); user 2 entirely pre-epoch
    val ev = Seq((1L, -15L), (1L, -5L), (1L, 5L), (2L, -20L), (2L, -11L))
      .toDF("user_id", "ts_us")
    val cells = Funnel.cohortRetention(ev, "user_id", "ts_us",
        periodUs = 10L, maxPeriods = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells == Map(
      (-2L, 0) -> 2L, // both: floor(-15/10) = floor(-20/10 .. -11/10) = -2
      (-2L, 1) -> 1L, // user 1 at -5 → period -1
      (-2L, 2) -> 1L  // user 1 at 5 → period 0
    ), s"got $cells")
  }

  test("transition matrix counts adjacent pairs and normalizes per source") {
    val s2 = spark; import s2.implicits._
    // user 1: a→b→a→b ; user 2: a→b→c ; adjacency only WITHIN a user
    val ev = Seq((1L, "a", 1L, 10L), (1L, "b", 2L, 20L), (1L, "a", 3L, 30L),
        (1L, "b", 4L, 40L), (2L, "a", 5L, 10L), (2L, "b", 6L, 20L),
        (2L, "c", 7L, 30L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val got = Funnel.transitionMatrix(ev, "user_id",
        Seq("ts_us", "event_id"), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 1.0)),     // every a is followed by b
      ("b", "a") -> ((1L, 0.5)),     // b → a once, b → c once
      ("b", "c") -> ((1L, 0.5))), s"got $got")
  }

  test("transition probabilities sum to 1 per source event") {
    val ev = graft.queries.QueryDef.eventsMicros(spark,
      "/root/testdata/sf0.001")
    val sums = Funnel.transitionMatrix(ev, "user_id",
        Seq("ts_us", "event_id"), "event_type")
      .groupBy("from_event").agg(sum("p").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach { case (e, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"from=$e sums to $s") }
  }

  test("transition ties break on the id order column") {
    val s2 = spark; import s2.implicits._
    // same timestamp: event_id orders b before c deterministically
    val ev = Seq((1L, "a", 1L, 10L), (1L, "b", 2L, 20L), (1L, "c", 3L, 20L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val got = Funnel.transitionMatrix(ev, "user_id",
        Seq("ts_us", "event_id"), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")), s"got $got")
  }

  test("stage times are ONE key shuffle (windows stack on it)") {
    val plan = Funnel.stageTimes(fixture, "user_id", "event_type", "ts_us",
      Seq("signup", "click", "purchase")).queryExecution.executedPlan.toString
    val hashEx = "(?i)exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, plan)
  }

  private def patternFixture = {
    val s2 = spark; import s2.implicits._
    Seq(
      // user 1: A at 1, stray B BEFORE the A must not count; chain is
      // A(1) -> B(4) -> C(5), skipping the C at 3 that precedes the B
      (1L, "B", 0L), (1L, "A", 1L), (1L, "C", 3L), (1L, "B", 4L),
      (1L, "C", 5L),
      // user 2: A then C but never a B after the A -> unmatched at p2
      (2L, "A", 1L), (2L, "C", 2L),
      // user 3: same-instant A and B — strict progression needs B to
      // sort AFTER A via the event_id tie-break
      (3L, "A", 10L), (3L, "B", 10L), (3L, "C", 11L),
      // user 4: nothing relevant
      (4L, "X", 1L)
    ).zipWithIndex.map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
      .toDF("user_id", "event_type", "ts_us", "event_id")
  }

  test("pattern match finds the earliest strict chain per key") {
    val got = Funnel.matchPattern(patternFixture, "user_id",
        Seq("ts_us", "event_id"), "event_type", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> (
        Option(r.getAs[java.lang.Integer]("p1")),
        Option(r.getAs[java.lang.Integer]("p2")),
        Option(r.getAs[java.lang.Integer]("p3")),
        r.getAs[Int]("matched"))).toMap
    // user 1 order: B(0) A(1) C(3) B(4) C(5) -> positions 2, 4, 5
    assert(got(1L) == ((Some(2), Some(4), Some(5), 1)), s"got ${got(1L)}")
    assert(got(2L) == ((Some(1), None, None, 0)), s"got ${got(2L)}")
    // user 3: A and B share ts; event_id orders A first, so B at pos 2
    // satisfies the STRICT progression
    assert(got(3L) == ((Some(1), Some(2), Some(3), 1)), s"got ${got(3L)}")
    assert(got(4L) == ((None, None, None, 0)), s"got ${got(4L)}")
  }

  test("pattern match is ONE key shuffle (stage windows stack)") {
    val plan = Funnel.matchPattern(patternFixture, "user_id",
        Seq("ts_us", "event_id"), "event_type", Seq("A", "B", "C"))
      .queryExecution.executedPlan.toString
    val hashEx = "(?i)exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, plan)
  }

  test("windowed funnel: in-window chains convert, out-of-window stall") {
    val s2 = spark; import s2.implicits._
    val ev = Seq(
      // user 1: A(0) B(5) C(9) — every hop within gap 10
      (1L, "A", 0L), (1L, "B", 5L), (1L, "C", 9L),
      // user 2: B arrives 11 after A — misses the window; the later B
      // at 30 is way out too
      (2L, "A", 0L), (2L, "B", 11L), (2L, "B", 30L),
      // user 3: anchor at FIRST A (t=0); B in (0,10] at 7; C within 10
      // of 7 at 16; the earlier C at 2 must NOT count (before B)
      (3L, "C", 2L), (3L, "A", 0L), (3L, "B", 7L), (3L, "C", 16L),
      // user 4: first-touch semantics — the failed first entrance
      // (A@0, no B by 10) masks the later entrance (A@95, B@100):
      // documented strict first-entrance behavior
      (4L, "A", 0L), (4L, "A", 95L), (4L, "B", 100L), (4L, "C", 105L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = Funnel.matchPatternWithin(ev, "user_id", "ts_us",
        "event_type", Seq("A", "B", "C"), maxGapUs = 10L)
      .collect().map(r => r.getLong(0) -> (
        Option(r.getAs[java.lang.Long]("t1")),
        Option(r.getAs[java.lang.Long]("t2")),
        Option(r.getAs[java.lang.Long]("t3")),
        r.getAs[Int]("matched"))).toMap
    assert(got(1L) == ((Some(0L), Some(5L), Some(9L), 1)), got(1L).toString)
    assert(got(2L) == ((Some(0L), None, None, 0)), got(2L).toString)
    assert(got(3L) == ((Some(0L), Some(7L), Some(16L), 1)), got(3L).toString)
    assert(got(4L) == ((Some(0L), None, None, 0)), got(4L).toString)
  }
}
