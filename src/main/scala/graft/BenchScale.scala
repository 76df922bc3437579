package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal benchmark: runs a named subset of battery entries at
  * TWO scale factors (sf0.1 and a synthesized sf1 by default) and emits
  * one JSON line with per-entry minima and the sfB/sfA time ratio — the
  * machine-checked form of the "this plan survives 10× data" claim.
  * At 10× data a healthy distributed plan is ≤ ~15× wall clock (near-
  * linear plus scheduling constants; super-linear outliers either have
  * answer-size growth as their named cause or are plan defects).
  *
  * Env knobs: `SPARK_GRAFT_SF_A` / `SPARK_GRAFT_SF_B` (dirs),
  * `SPARK_GRAFT_ENTRIES` (comma-separated names; defaults to the
  * most-expensive set the round-6 verdict asked to rehearse),
  * `SPARK_GRAFT_BENCH_OUT` (artifact path). Sampling mirrors
  * [[Bench]]: min-of-2 always, a third sample when the first two
  * disagree by > 1.5× (load-spike signature), loadavg + GC recorded so
  * a contended run self-identifies.
  */
object BenchScale {

  /** The 12 most expensive round-6 entries (per BENCH_r06) + the
    * round-7/8 additions worth rehearsing at scale (round 8 adds the
    * Zipf-hot salted join the r7 verdict asked to ratio-check, the
    * driver-local BPE, the reverse-attribution stream, and batched
    * k-centers).
    */
  private val defaultEntries = Seq(
    "q62_pipeline_synthetic", "q150_label_propagation",
    "q159_sparse_cosine_pairs", "q154_canonical_by_quality",
    "q98_pagerank", "q72_neardup_components", "q83_neardedup_corpus",
    "q113_decontaminate_bloom", "q116_bm25_search", "q118_hybrid_rrf",
    "q144_bpe_apply", "q184_naive_bayes",
    "q190_bpe_sampled", "q191_nb_holdout", "q192_pareto_bucketed",
    "q188_streaming_left_join", "q189_streaming_timeout",
    "q213_bpe_local", "q214_streaming_reverse_attribution",
    "q216_kcenters_batched", "q217_skew_join",
    // round-8 additions: the ungated exact-tier prefix-filter join is
    // the headline scale claim; the rest are the new profiling /
    // streaming / time-series shapes
    "q223_prefix_filter_join", "q224_bootstrap_ci",
    "q225_golden_records", "q226_seasonal_anomalies",
    "q227_time_weighted_avg", "q228_streaming_distinct",
    // late round-8 additions: the partial-agg WOR quota, the dense
    // moments aggregator, BFS frontier layers, and the key-grain join
    // estimator — the four genuinely new physical shapes
    "q231_weighted_wor", "q237_gram_profile",
    "q239_khop_bfs", "q240_join_cardinality",
    // final round-8 additions: retrieval eval on the BM25 chain, the
    // decode-heavy perceptual-hash pair join, and the single-pass
    // expectations gate
    "q243_ndcg", "q249_image_dhash_pairs", "q252_expectations",
    // round-9 additions: the bucket-offset global rank (the one new
    // physical shape), sorted-neighborhood blocking over it, and the
    // narrow per-pair text metrics
    "q260_global_rank", "q261_sorted_neighbors", "q262_rouge_l",
    "q263_bleu",
    // round-10 additions: the ML algebra trio, the spill certificate,
    // the prefix-sum/packing pair, the span-dedup audit, the blocklist
    // pair, KN perplexity, and the Z-order skipping audit
    "q264_ml_fold_assignment", "q265_ml_report_algebra", "q266_hash_folds",
    "q267_spill_certificate", "q268_global_cumsum",
    "q269_context_windows", "q270_duplicated_spans",
    "q272_blocklist_scan", "q273_redact_blocklist", "q274_kn_perplexity",
    "q275_zorder_skipping",
    // round-11 additions: the corpus-law fits (rank machinery at the
    // vocab grain), the recall audit (exact + banded tiers composed),
    // rendezvous routing, and the resampler
    "q276_zipf_fit", "q277_heaps_law", "q278_lsh_plan",
    "q279_audio_resample", "q280_rendezvous_sharding",
    "q281_lsh_recall_audit", "q282_hilbert_skipping",
    "q283_epoch_shuffle", "q284_intrinsic_dimension",
    "q285_energy_distance", "q286_confusable_dedup", "q287_low_quality_spans")

  private def loadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(",")
    catch { case _: Throwable => "" }

  private def gcSec: Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum / 1e3
  }

  def main(args: Array[String]): Unit = {
    val sfA = sys.env.getOrElse("SPARK_GRAFT_SF_A", "/root/testdata/sf0.1")
    val sfB = sys.env.getOrElse("SPARK_GRAFT_SF_B", "target/sf1")
    val entries = sys.env.get("SPARK_GRAFT_ENTRIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultEntries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defs = SparkEntry.defs.map(q => q.name -> q).toMap
    val missing = entries.filterNot(defs.contains)
    require(missing.isEmpty, s"unknown entries: $missing")

    // warm-up (JIT + codegen + classloading off the first timed entry)
    try SparkEntry.queries("q03_distinct")(spark, sfA).count()
    catch { case _: Throwable => () }

    def sample(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        // full-row noop materialization, NOT count(): count lets Catalyst
        // prune a map-shaped entry's own compute (see Bench.materialize),
        // which flattens exactly the curvature this instrument measures
        Bench.materialize(defs(name).query(spark, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val t1 = once(); val t2 = once()
      val base = Seq(t1, t2)
      (if (t2.max(t1) / t2.min(t1) > 1.5) base :+ once() else base).min
    }

    val loadStart = loadavg
    val rows = entries.map { name =>
      val res = try {
        val a = sample(name, sfA)
        val b = sample(name, sfB)
        Some((a, b))
      } catch { case e: Throwable =>
        System.err.println(s"[bench-scale] $name failed: ${e.getMessage}")
        spark.catalog.clearCache()
        None
      }
      name -> res
    }
    val qs = rows.map {
      case (n, Some((a, b))) =>
        f""""$n":{"sfA":$a%.3f,"sfB":$b%.3f,"ratio":${b / a}%.2f}"""
      case (n, None) => s""""$n":{"failed":true}"""
    }.mkString("{", ",", "}")
    val failed = rows.collect { case (n, None) => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    // default to a scratch path: committed round artifacts (r0N_sf1.json)
    // are curated merges, and an unexported default must never clobber a
    // previous round's record (it did once - restored from history)
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/scale_scratch.json")
    val line =
      f"""{"metric":"scale_rehearsal","sfA":"$sfA","sfB":"$sfB","queries":$qs,"failed":$failed,"loadavg_start":"$loadStart","loadavg_end":"$loadavg","gc_sec":$gcSec%.1f,"artifact":"$artifact"}"""
    try {
      val p = java.nio.file.Paths.get(artifact).toAbsolutePath
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench-scale] artifact write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
