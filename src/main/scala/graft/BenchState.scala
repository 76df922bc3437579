package graft

import org.apache.spark.sql.SparkSession

/** Streaming state-posture rehearsal: runs every stateful battery
  * entry at `SPARK_GRAFT_SF_DIR` under BOTH state-store providers (the
  * default in-memory HDFSBacked and RocksDB — the 100 TB posture) and
  * records, per entry and provider, the wall time plus the final
  * per-operator state footprint (operator name, rows in state, bytes)
  * that [[graft.queries.StreamingQuery]] captured from the query's
  * progress stream. One JSON line to `SPARK_GRAFT_BENCH_OUT` (default
  * `bench/state_scratch.json`) — the machine-checked form of "the
  * streaming family's state is watermark-bounded and survives the
  * off-heap provider unchanged".
  */
object BenchState {

  /** entry name -> its memory-sink name (where the harness parks the
    * captured state-operator progress). */
  private val statefulEntries = Seq(
    "q65_streaming_hourly" -> "stream_hourly",
    "q85_streaming_sliding" -> "stream_sliding",
    "q93_streaming_join" -> "stream_join",
    "q111_streaming_dedup" -> "stream_dedup",
    "q143_streaming_session" -> "stream_session",
    "q186_streaming_state" -> "stream_state",
    "q188_streaming_left_join" -> "stream_left_join",
    "q189_streaming_timeout" -> "stream_timeout",
    "q214_streaming_reverse_attribution" -> "stream_rev_attr",
    "q218_streaming_full_outer" -> "stream_full_outer",
    "q228_streaming_distinct" -> "stream_distinct",
    "q247_streaming_weighted_sample" -> "stream_wor",
    "q255_streaming_funnel" -> "stream_funnel")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-state")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defs = SparkEntry.defs.map(q => q.name -> q).toMap

    def runAll(provider: String): Seq[String] = {
      // set the conf EXPLICITLY for both legs (never unset): the session
      // conf is the channel withStateStore reads first, so an ambient
      // GRAFT_STATE_STORE env var cannot silently turn the hdfs leg into
      // a second rocksdb run
      spark.conf.set("spark.graft.stateStore", provider)
      statefulEntries.map { case (name, sink) =>
        val res = try {
          val t0 = System.nanoTime()
          val n = defs(name).query(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          val ops = graft.queries.StreamingQuery.stateMetricsFor(sink)
            .map { case (op, rows, bytes) =>
              s"""{"op":"$op","rows":$rows,"bytes":$bytes}"""
            }.mkString("[", ",", "]")
          f""""$name":{"sec":$dt%.3f,"rows_out":$n,"state":$ops}"""
        } catch { case e: Throwable =>
          spark.catalog.clearCache()
          val msg = String.valueOf(e.getMessage)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)
          s""""$name":{"failed":"$msg"}"""
        }
        res
      }
    }

    // warm-up off the first timed entry
    try SparkEntry.queries("q65_streaming_hourly")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val byProvider = Seq("hdfs", "rocksdb").map { p =>
      s""""$p":${runAll(p).mkString("{", ",", "}")}"""
    }.mkString(",")
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/state_scratch.json")
    val line = s"""{"metric":"state_posture","sf":"$sfDir",$byProvider,"artifact":"$artifact"}"""
    try {
      val path = java.nio.file.Paths.get(artifact).toAbsolutePath
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.write(path, (line + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench-state] artifact write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
