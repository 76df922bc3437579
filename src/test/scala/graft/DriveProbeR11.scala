package graft

import org.apache.spark.sql.SparkSession

/** Scratch round-11 probe (deleted after the run): times the three
  * entries the round-10 verdict flagged (q223/q116/q184) under BOTH the
  * r<=9 count() timer and the r10 noop-sink timer, min-of-3 each, same
  * build, same data — so the methodology share of the r9->r10 wall-time
  * move is measured, not assumed.
  */
object DriveProbeR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-r11")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg: String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(",")

    val entries = Seq("q223_prefix_filter_join", "q116_bm25_search",
      "q184_naive_bayes")
    // warm-up
    SparkEntry.queries("q03_distinct")(spark, sfDir).count()

    def sample(name: String, noop: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (noop) df.write.mode("overwrite").format("noop").save()
      else df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    println(s"PROBE loadavg_start=$loadavg")
    for (name <- entries) {
      val counts = (1 to 3).map(_ => sample(name, noop = false))
      val noops = (1 to 3).map(_ => sample(name, noop = true))
      println(f"PROBE $name count_samples=${counts.map(x => f"$x%.2f").mkString(",")} " +
        f"count_min=${counts.min}%.2f noop_samples=${noops.map(x => f"$x%.2f").mkString(",")} " +
        f"noop_min=${noops.min}%.2f loadavg=$loadavg")
    }
    println(s"PROBE loadavg_end=$loadavg")
    spark.stop()
  }
}
