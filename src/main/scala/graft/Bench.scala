package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs the full query battery against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up on a cheap query so per-query timings measure the
    // plan, not first-call JIT + classloading.
    try SparkEntry.queries("q03_distinct")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // MLlib warm-up: the first forest fit in a JVM pays several seconds of
    // one-time class-loading + JIT that would otherwise land entirely on
    // whichever battery entry first touches spark.ml (q60). A 64-row
    // single-tree fit triggers the same code paths at negligible cost.
    try {
      import org.apache.spark.sql.functions.{col, rand}
      val cols = graft.pipeline.PairVectors.vectorColumns
      val toy = spark.range(0, 64).select(
        (col("id") % 2 === 0).as("related") +:
          cols.map(c => rand(c.hashCode.toLong).as(c)): _*)
      graft.ml.Classify.crossValPredictions(toy, folds = 2, seed = 1L,
        numTrees = 1).unpersist()
      ()
    } catch { case _: Throwable => () }

    val results = SparkEntry.defs.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.query(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Session hygiene between entries: any relation a query persisted and
      // failed to release must not distort the NEXT entries' timings
      // (round-1 lesson: leaked caches inflated q62 by 8×).
      spark.catalog.clearCache()
      (q.name, if (ok) dt else -1.0, ok)
    }
    // failed queries are reported as -1.0 and excluded from the total, plus
    // listed in "failed" so a partially-broken run can't pass as a fast one
    val qs = results.map { case (k, v, _) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
