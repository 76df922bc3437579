package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc

/** MERGE/upsert semantics on a hand-built changelog where every case is
  * enumerable: matched update, unmatched base keep, delete, re-insert
  * after delete, changelog-only insert, same-sequence tiebreak.
  */
class CdcSpec extends AnyFunSuite with SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def changelog: DataFrame = {
    val s2 = spark; import s2.implicits._
    Seq(
      // key 1: two updates — latest (seq 20) wins
      (1L, 10L, 100L, "U", "v1a"),
      (1L, 20L, 101L, "U", "v1b"),
      // key 2: update then delete — key disappears
      (2L, 10L, 102L, "U", "v2"),
      (2L, 30L, 103L, "D", "gone"),
      // key 3: delete then re-insert — key survives with the new value
      (3L, 10L, 104L, "D", "gone"),
      (3L, 40L, 105L, "U", "v3"),
      // key 4: two changes with the SAME seq — event_id tiebreak wins
      (4L, 50L, 106L, "U", "v4lo"),
      (4L, 50L, 107L, "U", "v4hi"),
      // key 9: changelog-only insert
      (9L, 60L, 108L, "U", "v9")
    ).toDF("k", "seq", "id", "op", "payload")
  }

  private def base: DataFrame = {
    val s2 = spark; import s2.implicits._
    // keys 1-3 exist in base; key 5 has no changes and must survive
    Seq((1L, "base1"), (2L, "base2"), (3L, "base3"), (5L, "base5"))
      .toDF("k", "payload")
  }

  test("latestSnapshot keeps the highest-sequence upsert per key") {
    val snap = Cdc.latestSnapshot(changelog, "k", Seq("seq", "id"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("payload")).toMap
    assert(snap == Map(1L -> "v1b", 3L -> "v3", 4L -> "v4hi", 9L -> "v9"),
      s"got $snap")
  }

  test("mergeInto: update, keep, delete, re-insert, insert, tiebreak") {
    val merged = Cdc.mergeInto(base, changelog, "k", Seq("seq", "id"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("payload")).toMap
    assert(merged == Map(
      1L -> "v1b",  // matched: latest change wins over base
      3L -> "v3",   // delete then re-insert survives
      4L -> "v4hi", // equal seq: id tiebreak
      5L -> "base5", // unmatched base row kept
      9L -> "v9"    // changelog-only insert
    ), s"got $merged") // key 2 deleted
  }

  test("scd2 closes versions at the next change and deletes emit nothing") {
    val hist = Cdc.scd2(changelog, "k", Seq("seq", "id"))
      .select("k", "valid_from", "valid_to", "is_current", "payload")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current"), r.getAs[String]("payload"))).toSet
    assert(hist == Set(
      (1L, 10L, Some(20L), false, "v1a"),
      (1L, 20L, None, true, "v1b"),
      // key 2's only version is CLOSED by the delete and nothing is current
      (2L, 10L, Some(30L), false, "v2"),
      (3L, 40L, None, true, "v3"),
      (4L, 50L, Some(50L), false, "v4lo"), // tiebreak orders equal seqs
      (4L, 50L, None, true, "v4hi"),
      (9L, 60L, None, true, "v9")
    ), s"got $hist")
  }

  test("a null sequence never wins a key (desc_nulls_last pin)") {
    val s2 = spark; import s2.implicits._
    val withNull = Seq((1L, Some(10L), 1L, "U", "a"), (1L, None, 2L, "U", "b"))
      .toDF("k", "seq", "id", "op", "payload")
    // the require guards the CONTRACT (columns present); null ordering is
    // the cross-engine trap — snapshot must not treat null as "latest"
    val snap = Cdc.latestSnapshot(withNull, "k", Seq("seq", "id"))
      .collect().map(_.getAs[String]("payload"))
    assert(snap.sameElements(Array("a")),
      s"null seq ordered as latest: ${snap.mkString(",")}")
  }

  test("mergeInto rejects negative sequences instead of losing the change") {
    val s2 = spark; import s2.implicits._
    // a pre-1970 event time would lose to the -1 base sentinel — the
    // contract violation must raise, not silently keep the base row
    val negative = Seq((1L, -5L, 1L, "U", "pre-epoch"))
      .toDF("k", "seq", "id", "op", "payload")
    val e = intercept[Exception] {
      Cdc.mergeInto(base, negative, "k", Seq("seq", "id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-negative")), e.getMessage)
  }

  test("snapshot diff classifies every key case") {
    val s2 = spark; import s2.implicits._
    val before = Seq(
      (1L, "same", "en"), (2L, "edited", "en"), (3L, "dropped", "de"),
      (5L, "ab", "c"))
      .toDF("k", "text", "lang")
    val after = Seq(
      (1L, "same", "en"), (2L, "edited v2", "en"), (4L, "brand new", "fr"),
      // the separator matters: ("a","bc") must NOT hash like ("ab","c")
      (5L, "a", "bc"))
      .toDF("k", "text", "lang")
    val got = Cdc.snapshotDiff(before, after, "k", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed"), got.toString)
  }

  test("snapshot diff sees a value shifting across columns through NULL") {
    val s2 = spark; import s2.implicits._
    // concat_ws skips NULL operands, so without the NUL sentinel both
    // rows would concatenate to the same bytes and read as 'unchanged'
    val before = Seq((1L, Some("x"), None: Option[String], Some("y")),
      (2L, Some("a"), None: Option[String], None: Option[String]),
      (3L, Some("a"), Some("b"), None: Option[String]))
      .toDF("k", "c1", "c2", "c3")
    val after = Seq((1L, Some("x"), Some("y"), None: Option[String]),
      (2L, None: Option[String], Some("a"), None: Option[String]),
      (3L, Some("a"), Some("b"), None: Option[String]))
      .toDF("k", "c1", "c2", "c3")
    val got = Cdc.snapshotDiff(before, after, "k", Seq("c1", "c2", "c3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"),
      got.toString)
  }

  test("point-in-time join respects validity, gaps, and instant ties") {
    val s2 = spark; import s2.implicits._
    // key 1: created at 10 (v=1.0), updated at 20 (v=2.0), DELETED at
    // 30, re-created at 40 (v=4.0); key 2: two same-instant updates at
    // 10 (change ids 20 < 21) — the later change id wins immediately
    val changes = Seq(
      (1L, 10L, 10L, "U", 1.0), (1L, 20L, 11L, "U", 2.0),
      (1L, 30L, 12L, "D", 0.0), (1L, 40L, 13L, "U", 4.0),
      (2L, 10L, 20L, "U", 5.0), (2L, 10L, 21L, "U", 6.0)
    ).toDF("user_id", "seq_us", "event_id", "op", "value")
    val hist = Cdc.scd2(changes, "user_id", Seq("seq_us", "event_id"))
    val facts = Seq(
      (100L, 1L, 5L),   // before any version -> null
      (101L, 1L, 15L),  // inside v1
      (102L, 1L, 20L),  // at v2's start (<= counts)
      (103L, 1L, 35L),  // in the deletion gap -> null, NOT stale v2
      (104L, 1L, 45L),  // after re-creation
      (105L, 2L, 10L),  // same-instant tie -> later change id (6.0)
      (106L, 3L, 10L)   // key with no history at all
    ).toDF("fact_id", "user_id", "ts_us")
    val got = Cdc.pointInTimeJoin(facts, hist, "user_id", "ts_us",
        Seq("event_id"), Seq("value"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("pit_value"))).toMap
    assert(got == Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> None, 104L -> Some(4.0), 105L -> Some(6.0),
      106L -> None), got.toString)
  }

  test("merged agg states equal the full recompute, any split") {
    val s2 = spark; import s2.implicits._
    val rows = (1L to 200L).map(i => (i % 7, i * 31 % 101))
    val df = rows.toDF("k", "v")
    def state(d: org.apache.spark.sql.DataFrame) =
      Cdc.aggState(d, Seq("k"), Seq("v"))
    val full = state(df).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    for (m <- Seq(2L, 3L, 5L)) {
      val merged = Cdc.mergeAggStates(
          state(df.where(col("k") % m === 0)),
          state(df.where(col("k") % m =!= 0)),
          Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(merged == full, s"split %$m diverged")
    }
    // keys present in only one side survive the merge
    val lop = Cdc.mergeAggStates(
      state(df.where(col("k") === 0)), state(df.where(col("k") === 1)),
      Seq("k"), Seq("v")).collect()
    assert(lop.length == 2)
  }
}
