package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Streams
import QueryDef.table

/** Structured Streaming inside the oracle-checked battery: a real
  * `readStream` → watermarked tumbling-window aggregation → memory sink is
  * run to completion over the bounded events table, and the DuckDB oracle
  * reproduces append-mode emission semantics (only windows the final
  * watermark passed are emitted — the trailing unfinalized windows are
  * absent from BOTH sides).
  */
object StreamingQuery {

  val all: Seq[QueryDef] = Seq(
    QueryDef("q65_streaming_hourly",
      (s, d) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // file streams need a directory: stage the single parquet file
        val dir = java.nio.file.Files.createTempDirectory("graft_stream")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          dir.resolve("events.parquet"))
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val stream = s.readStream.schema(schema).parquet(dir.toString)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        val name = s"stream_hourly_${System.nanoTime()}"
        val q = Streams.tumblingCounts(stream, "1 hour", "30 minutes")
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        // Materialize the sink rows, then drop the memory-sink table and
        // the staged directory — leaving them registered leaked the full
        // sink contents into the session for every later battery entry.
        val res = s.table(name)
          .select(col("window_start"), col("event_type"), col("n"),
            round(col("total_value"), 4).as("total_value"))
          .orderBy("window_start", "event_type")
        val rows = res.collect()
        s.catalog.dropTempView(name)
        QueryDef.deleteRecursively(dir)
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      },
      // append-mode emission: window emitted iff watermark (max event time
      // minus 30 min) reached its end — reproduce that cutoff exactly
      Some("""WITH cutoff AS (
             |  SELECT MAX(epoch_us(ts)) - 1800000000 AS wm FROM events),
             |agg AS (
             |  SELECT STRFTIME(make_timestamp(
             |      (epoch_us(ts) // 3600000000) * 3600000000),
             |      '%Y-%m-%d %H:%M:%S') AS window_start,
             |    (epoch_us(ts) // 3600000000) * 3600000000 + 3600000000
             |      AS window_end_us,
             |    event_type,
             |    COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
             |  FROM events GROUP BY 1, 2, 3)
             |SELECT window_start, event_type, n, total_value
             |FROM agg, cutoff WHERE window_end_us <= wm
             |ORDER BY window_start, event_type""".stripMargin)),
  )
}
