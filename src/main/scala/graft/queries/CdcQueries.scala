package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Cdc
import graft.queries.QueryDef.{eventsMicros, table}

/** CDC / MERGE INTO battery entries: the events table doubles as a
  * changelog over customer account state (key = user_id, sequence =
  * event-time microseconds + event_id, `error` events = deletions,
  * everything else = upserts of the event's value), and the customer
  * table is the base the changelog merges into.
  */
object CdcQueries {

  /** The synthetic changelog: one change row per event. */
  private def changes(s: SparkSession, d: String): DataFrame = {
    eventsMicros(s, d)
      .select(col("user_id"),
        col("ts_us").as("seq_us"),
        col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        round(col("value"), 2).as("value"),
        col("event_type").as("status"))
  }

  private def base(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .select(col("c_custkey").as("user_id"),
        round(col("c_acctbal"), 2).as("value"),
        lit("base").as("status"))

  private val changesSql =
    """SELECT user_id, epoch_us(ts) AS seq_us, event_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    ROUND(value, 2) AS value, event_type AS status
      |  FROM events""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // MERGE INTO: base customers + the event changelog → the live table.
    // Keys with no events keep their base row; keys whose last event is
    // an error are deleted; everyone else holds their latest event state.
    QueryDef("q94_merge_upsert",
      (s, d) => Cdc.mergeInto(base(s, d), changes(s, d),
          "user_id", Seq("seq_us", "event_id"))
        .orderBy("user_id"),
      Some(s"""WITH changes AS ($changesSql),
              |merged AS (
              |  SELECT c_custkey AS user_id, CAST(-1 AS BIGINT) AS seq_us,
              |      CAST(-1 AS BIGINT) AS event_id, 'U' AS op,
              |      ROUND(c_acctbal, 2) AS value, 'base' AS status
              |    FROM customer
              |  UNION ALL SELECT * FROM changes),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              |      ORDER BY seq_us DESC, event_id DESC) AS rk
              |  FROM merged)
              |SELECT user_id, seq_us, event_id, value, status
              |FROM ranked WHERE rk = 1 AND op <> 'D'
              |ORDER BY user_id""".stripMargin)),

    // SCD2 history: every upsert becomes a validity interval closed by
    // the key's next change (deletes close but emit nothing).
    QueryDef("q95_scd2_history",
      (s, d) => Cdc.scd2(changes(s, d), "user_id", Seq("seq_us", "event_id"))
        .select(col("user_id"), col("valid_from"), col("event_id"),
          col("valid_to"), col("is_current"), col("value"), col("status"))
        .orderBy("user_id", "valid_from", "event_id"),
      Some(s"""WITH changes AS ($changesSql),
              |versions AS (
              |  SELECT user_id, seq_us AS valid_from, event_id, op,
              |    LEAD(seq_us, 1) OVER (PARTITION BY user_id
              |      ORDER BY seq_us, event_id) AS valid_to,
              |    value, status
              |  FROM changes)
              |SELECT user_id, valid_from, event_id, valid_to,
              |  (valid_to IS NULL) AS is_current, value, status
              |FROM versions WHERE op <> 'D'
              |ORDER BY user_id, valid_from, event_id""".stripMargin)),

    // snapshot diff: documents vs a deterministically mutated release
    // (removals at %97, text edits at %31, additions at %53 with shifted
    // ids) classified added/removed/changed/unchanged by content hash —
    // both engines hash (text, lang) with a 0x1F separator and a NUL
    // sentinel for NULLs (mirrors [[Cdc.snapshotDiff]]).
    QueryDef("q138_snapshot_diff",
      (s, d) => {
        val before = table(s, d, "documents")
          .select("doc_id", "text", "lang")
        val changed = before.where(col("doc_id") % 31 === 0)
          .withColumn("text", concat(col("text"), lit(" v2")))
        val added = before.where(col("doc_id") % 53 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val after = before
          .where(col("doc_id") % 97 =!= 0 && col("doc_id") % 31 =!= 0)
          .unionByName(changed).unionByName(added)
        Cdc.snapshotDiff(before, after, "doc_id", Seq("text", "lang"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |    md5(concat_ws(chr(31), COALESCE(text, chr(0)),
             |      COALESCE(lang, chr(0)))) AS h FROM documents),
             |a0 AS (
             |  SELECT doc_id, text, lang FROM documents
             |    WHERE doc_id % 97 <> 0 AND doc_id % 31 <> 0
             |  UNION ALL SELECT doc_id, text || ' v2', lang
             |    FROM documents WHERE doc_id % 31 = 0
             |  UNION ALL SELECT doc_id + 1000000, text, lang
             |    FROM documents WHERE doc_id % 53 = 0),
             |a AS (SELECT doc_id,
             |    md5(concat_ws(chr(31), COALESCE(text, chr(0)),
             |      COALESCE(lang, chr(0)))) AS h FROM a0)
             |SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
             |  CASE WHEN b.h IS NULL THEN 'added'
             |    WHEN a.h IS NULL THEN 'removed'
             |    WHEN b.h = a.h THEN 'unchanged'
             |    ELSE 'changed' END AS status
             |FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Point-in-time join: click facts enriched with the SCD2 account
    // version valid AT event time — deletion gaps yield NULLs, not the
    // stale pre-deletion version. The oracle joins on the validity
    // interval directly (intervals partition each key's timeline, so at
    // most one version matches).
    QueryDef("q167_point_in_time",
      (s, d) => {
        val hist = Cdc.scd2(changes(s, d), "user_id",
          Seq("seq_us", "event_id"))
        val facts = eventsMicros(s, d)
          .where(col("event_type") === "click")
          .select(col("event_id").as("fact_id"), col("user_id"),
            col("ts_us"))
        Cdc.pointInTimeJoin(facts, hist, "user_id", "ts_us",
            Seq("event_id"), Seq("value", "status"))
          .select(col("fact_id"), col("user_id"), col("ts_us"),
            col("pit_valid_from"), col("pit_event_id"),
            col("pit_value"), col("pit_status"))
          .orderBy("fact_id")
      },
      Some(s"""WITH changes AS ($changesSql),
              |versions AS (
              |  SELECT user_id, seq_us AS valid_from, event_id, op,
              |    LEAD(seq_us, 1) OVER (PARTITION BY user_id
              |      ORDER BY seq_us, event_id) AS valid_to,
              |    value, status
              |  FROM changes),
              |v AS (SELECT * FROM versions WHERE op <> 'D'),
              |f AS (SELECT event_id AS fact_id, user_id,
              |    epoch_us(ts) AS ts_us
              |  FROM events WHERE event_type = 'click')
              |SELECT f.fact_id, f.user_id, f.ts_us,
              |  v.valid_from AS pit_valid_from,
              |  v.event_id AS pit_event_id,
              |  v.value AS pit_value, v.status AS pit_status
              |FROM f LEFT JOIN v ON f.user_id = v.user_id
              |  AND v.valid_from <= f.ts_us
              |  AND (v.valid_to IS NULL OR f.ts_us < v.valid_to)
              |ORDER BY fact_id""".stripMargin)),
  )
}
