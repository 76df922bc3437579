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

  /** PII patterns shared by [[redactPii]] and its tests/oracles. Kept to
    * constructs Java regex and RE2 interpret identically (character
    * classes, bounded repetition, \b — no lookaround, no backreferences)
    * so external engines can replay the redaction byte-for-byte.
    * The phone pattern requires a leading `+` (international form): bare
    * digit runs are too ambiguous to scrub at corpus scale.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9][0-9() -]{6,}[0-9]", "<PHONE>"))

  /** Scrub PII from the text column: emails, IPv4 addresses, and
    * international-format phone numbers are replaced with typed tokens,
    * with a per-document match count per category (counted BEFORE
    * redaction, applied in [[piiPatterns]] order so earlier categories
    * cannot be double-counted by later ones). Purely narrow — regex
    * projection per row, no shuffle, pipelines with the scan at 100 TB.
    * All other columns pass through.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, re, token)) => regexp_replace(c, re, token)
    }
    val counted = piiPatterns.foldLeft(docs) { case (df, (name, re, _)) =>
      df.withColumn(s"n_$name", regexp_count(col(textCol), lit(re)))
    }
    counted.withColumn(textCol, redacted)
  }

  /** HTML entities [[stripMarkup]] decodes, applied in order — `&amp;`
    * LAST, so a double-escaped `&amp;lt;` correctly yields the literal
    * text `&lt;` rather than re-decoding it to `<`.
    */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip HTML/XML markup from the text column — the first pass over any
    * web crawl: script/style blocks (with their contents) and comments go
    * first, then all remaining tags, then common entities decode
    * ([[htmlEntities]]), then whitespace collapses to single spaces. The
    * result is appended as `plain`; other columns pass through. Same
    * dialect discipline as [[piiPatterns]]: Java∩RE2 constructs only
    * (non-greedy dot-all, NO backreferences — script and style are
    * separate patterns for that reason), so external engines replay the
    * stripping byte-for-byte. Purely narrow: regex projection per row, no
    * shuffle, pipelines with the scan at 100 TB.
    */
  def stripMarkup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val blockPats = Seq(
      "(?s)<script\\b[^>]*>.*?</script>",
      "(?s)<style\\b[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "<[^>]+>")
    val untagged = blockPats.foldLeft(col(textCol)) {
      (c, re) => regexp_replace(c, re, " ")
    }
    val decoded = htmlEntities.foldLeft(untagged) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch)) // literal replace — entities aren't regex
    }
    docs.withColumn("plain", trim(regexp_replace(decoded, "\\s+", " ")))
  }

  /** Extract `href="..."` targets from markup — the crawl-frontier /
    * link-graph companion to [[stripMarkup]]: its output (doc → target)
    * is exactly the edge list [[Graph.pageRank]] ranks. Double-quoted
    * hrefs only, by contract (the dominant form; a single-quote variant
    * would need a second pattern — RE2 has no backreferences to unify
    * them). One row per extracted link in document order; duplicate
    * targets within a document are preserved (frontier semantics —
    * `distinct` afterwards for graph edges). Narrow 1→N explode. Both
    * column names are parameters resolved through the Column API (no SQL
    * interpolation — a name needing backticks just works).
    */
  def extractLinks(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      explode(regexp_extract_all(col(textCol),
        lit("href=\"([^\"]*)\""), lit(1)))
        .as("href"))

  /** C4-style line-level corpus dedup: drop every line (segment between
    * `sep`s) whose exact content appears in more than `maxDf` documents —
    * corpus-wide boilerplate (headers, footers, cookie banners) vanishes
    * while document-unique text survives. Documents whose every line is
    * boilerplate drop out entirely. Line order within each document is
    * preserved; other columns pass through.
    *
    * Shape at 100 TB: explode on lines → ONE distinct-df aggregation on
    * (line hash) with map-side combine → broadcast-or-shuffle join back —
    * here a plain equi-join keyed by the line hash (boilerplate tables are
    * corpus-scale, never broadcast) → per-doc re-assembly window keyed by
    * doc_id. Two shuffles of line-grain data, no corpus self-join.
    */
  def dropBoilerplateLines(docs: DataFrame, sep: String = "\n",
      maxDf: Long = 1L): DataFrame = {
    val others = docs.columns.filter(c => c != "doc_id" && c != "text")
    val lines = docs
      .select(col("doc_id") +: others.map(col) :+
        posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
        : _*)
      .withColumn("h", md5(col("col")))
    val df = lines.select(col("doc_id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("n_docs_with"))
    lines.join(df, "h")
      .where(col("n_docs_with") <= maxDf)
      .groupBy((col("doc_id") +: others.map(col)): _*)
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("pos"), col("col")))),
          s => s.getField("col"))).as("text"))
      .select((col("doc_id") +: col("text") +: others.map(col)): _*)
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minHits` distinct word `n`-grams with an evaluation set — the scan a
    * training pipeline runs against held-out benchmarks before training
    * (leakageScan's sibling: there both sides are corpus-scale, here the
    * right side is a benchmark, small by nature). Returns one row per
    * contaminated doc with the hit count and the fraction of the doc's
    * distinct n-grams that are contaminated.
    *
    * Shape at 100 TB: the eval n-gram set is broadcast (benchmarks are
    * small), and the per-doc distinct-gram total rides the SAME projection
    * the explode comes from — so the corpus is scanned ONCE (a second
    * counting branch would re-evaluate the gram pipeline; Spark does not
    * reuse exchanges across branches) and the only exchange is the per-doc
    * hit-count aggregation.
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, n: Int = 8,
      minHits: Long = 1L): DataFrame = {
    def distinctGrams = expr(
      s"""array_distinct(transform(sequence(1, size(t) - ${n - 1}),
         |  i -> concat_ws(' ', slice(t, i, $n))))""".stripMargin)
    val evalGrams = evalDocs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n)
      .select(explode(distinctGrams).as("gram"))
      .distinct()
    corpus
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= n)
      .select(col("doc_id"), distinctGrams.as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id", "n_grams").agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
      .select(col("doc_id"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_grams")).as("hit_frac"))
  }
}
