package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs over raw documents — exact dedup, quality gating,
  * stratified re-balancing, and leakage-safe splitting — as ONE logical
  * plan.
  *
  * Shape at 100 TB: one shuffle (the dedup window on the content hash);
  * everything after it is a narrow chain of projections/filters over the
  * surviving rows ([[TextAnalysis.quality]] and both [[Sampling]] stages
  * are shuffle-free), so Catalyst pipelines the whole post-dedup stage and
  * the job costs one pass + one exchange. Every step is md5-arithmetic
  * deterministic — reruns and engines agree row-for-row (the DuckDB
  * oracle replays the entire chain).
  */
object Curation {

  /** docs(doc_id, text, lang, ...) → curated rows with quality metrics and
    * a `split` column; every other input column (source, url, …) passes
    * through untouched. Exact duplicates collapse to the lowest-id copy
    * BEFORE sampling, so a duplicated document can never straddle splits.
    */
  def curate(docs: DataFrame,
      minQuality: Double,
      rates: Map[String, Double], defaultRate: Double,
      weights: Seq[(String, Double)]): DataFrame = {
    val canonical = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .where(col("rk") === 1).drop("rk")
    val scored = TextAnalysis.withQuality(canonical)
    val kept = scored.where(col("quality") >= minQuality)
    val sampled = Sampling.stratifiedSample(kept, "lang", rates, defaultRate)
    Sampling.contentSplit(sampled, weights)
  }

  /** Cross-split contamination scan: pairs of documents in DIFFERENT
    * splits that share a winnowing fingerprint — i.e. a common token run
    * of at least `w + k - 1` tokens. Content-hash splitting keeps exact
    * duplicates together, but NEAR-duplicates (edited copies, quoted
    * passages) can still straddle the train/eval boundary; this is the
    * detector an evaluation-integrity pass runs before shipping a split.
    * One fingerprint shuffle; quadratic only inside fingerprint buckets.
    * Single-branch by construction: the split column rides the winnow
    * projection and pairs come from [[Dedup.bucketPairsOf]]'s in-bucket
    * expansion, so the corpus is scanned ONCE (a fingerprint self-join
    * would evaluate the whole winnow pipeline per branch — Spark does not
    * reuse exchanges across self-join branches).
    */
  def leakageScan(splitDocs: DataFrame, k: Int, w: Int): DataFrame =
    Dedup.bucketPairsOf(
        TextAnalysis.winnow(splitDocs, k, w, keep = Seq("split"))
          .select(col("doc_id").as("id"), col("split"), col("fp")),
        Seq("fp"), struct(col("id"), col("split")))
      .where(col("a.split") =!= col("b.split"))
      .select(col("a.id").as("id1"), col("a.split").as("split1"),
        col("b.id").as("id2"), col("b.split").as("split2"))
      .distinct()
}
