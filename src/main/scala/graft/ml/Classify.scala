package graft.ml

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.PairVectors

/** Reference Step 5 / WekaModel re-expressed on spark.ml: 24-dim similarity
  * vectors → RandomForest → 10-fold cross-validated evaluation report
  * (accuracy, per-class precision/recall/F1, confusion matrix).
  *
  * Weka ↔ MLlib forests are different algorithms (SURVEY §7.4): parameters
  * are pinned toward Weka's defaults (numTrees=100 like Weka's iteration
  * count, maxDepth=30 = MLlib's cap standing in for Weka's unlimited,
  * featureSubsetStrategy="sqrt" ≈ Weka's log2+1), folds are seeded with 42
  * like the reference (`Step5.java:133-148`), and acceptance is a metric
  * band, not bit equality.
  */
object Classify {

  final case class Report(
      folds: Int,
      nInstances: Long,
      accuracy: Double,
      kappa: Double,
      aucSimilar: Double,
      precisionSimilar: Double,
      recallSimilar: Double,
      f1Similar: Double,
      weightedPrecision: Double,
      weightedRecall: Double,
      weightedF1: Double,
      mae: Double,
      rmse: Double,
      tp: Long, fn: Long, fp: Long, tn: Long) {

    /** Free-text rendering in the spirit of the reference's Weka report
      * (`Step5.java:150-167`, `README.md:111-132`).
      */
    def render: String =
      f"""=== $folds%d-fold cross-validation ===
         |Correctly classified:   ${(accuracy * nInstances).round}%d / $nInstances%d  (${accuracy * 100}%.4f %%)
         |Kappa statistic:        $kappa%.4f
         |Mean absolute error:    $mae%.4f
         |Root mean squared error: $rmse%.4f
         |ROC area (similar):     $aucSimilar%.4f
         |
         |=== Class "similar" ===
         |Precision: $precisionSimilar%.3f  Recall: $recallSimilar%.3f  F1: $f1Similar%.3f
         |=== Weighted avg ===
         |Precision: $weightedPrecision%.3f  Recall: $weightedRecall%.3f  F1: $weightedF1%.3f
         |
         |=== Confusion matrix ===
         |              predicted
         |actual     similar  not-similar
         |similar    $tp%8d  $fn%11d
         |not-sim    $fp%8d  $tn%11d""".stripMargin
  }

  /** Vectors DF (`related: Boolean` + the 24 [[PairVectors.vectorColumns]])
    * → out-of-fold predictions for every instance, via seeded 10-fold CV.
    * Non-finite features (the reference's Infinity sentinels surviving in
    * faithful mode) are clipped to ±1e15 — MLlib trees reject NaN/Inf.
    */
  def crossValPredictions(vectors: DataFrame, folds: Int = 10,
      seed: Long = 42L, numTrees: Int = 100): DataFrame = {
    val cols = PairVectors.vectorColumns
    val clipped = cols.foldLeft(vectors) { (df, c) =>
      df.withColumn(c,
        when(isnan(col(c)), 0.0)
          .when(col(c) > 1e15, 1e15)
          .when(col(c) < -1e15, -1e15)
          .otherwise(col(c)))
    }
    val prepared = clipped
      .withColumn("label", col("related").cast("double"))
      .cache()
    // MLlib tree fitting launches dozens of jobs per forest; leaving a
    // small training set scattered over shuffle-partition-count mostly-empty
    // partitions multiplies task-scheduling overhead ~20x (observed: 63s →
    // 3s for the battery's 8-row smoke). Size partitions to the data.
    val n = prepared.count()
    val parts = math.max(1, math.min(
      vectors.sparkSession.sparkContext.defaultParallelism,
      (n / 5000L).toInt + 1))
    // Stratified fold assignment (as Weka's CV does): within each label,
    // spread rows round-robin over folds in a seeded order. The order is
    // a CONTENT HASH of the pair key when one is present (deterministic
    // under any partitioning AND oracle-replayable — see
    // [[stratifiedFolds]]); inputs without (w1, w2) fall back to the
    // partition-seeded rand order (still seed-reproducible on a fixed
    // plan, just not content-addressed).
    val labeled = (
      if (prepared.columns.contains("w1") && prepared.columns.contains("w2"))
        stratifiedFolds(prepared, Seq("w1", "w2"), "label", folds, seed)
      else prepared.withColumn("fold",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy(rand(seed))) % folds).cast("int")))
      .repartition(parts)
      .cache()
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(numTrees).setMaxDepth(30)
      .setFeatureSubsetStrategy("sqrt").setSeed(seed)
      .setLabelCol("label").setFeaturesCol("features")
    def fitFold(k: Int): DataFrame = {
      val train = assembler.transform(labeled.where(col("fold") =!= k))
      val test = assembler.transform(labeled.where(col("fold") === k))
      if (train.isEmpty || test.isEmpty)
        test.select(col("label"), col("label").as("prediction"),
          col("label").as("p_similar")).limit(0)
      else {
        // a fold trained on a single class yields a 1-element probability
        // vector; recover P(similar) from the lone class's probability
        val arr = org.apache.spark.ml.functions.vector_to_array(col("probability"))
        // the MODEL copy drops the trainingSummary before the model rides
        // the prediction closure: the summary pins the SparkSession, and
        // a session whose ObservationManager has been initialized (ANY
        // Observation user in the process, e.g. Dedup.spillCertificate —
        // since round 11 the AQE observation path initializes it too)
        // is no longer java-serializable — the fit would then fail task
        // serialization through no fault of its own (ClassifySpec pins
        // the interaction). The ESTIMATOR copy before it keeps parallel
        // fold fits from sharing one mutable estimator.
        rf.copy(org.apache.spark.ml.param.ParamMap.empty).fit(train)
          .copy(org.apache.spark.ml.param.ParamMap.empty)
          .transform(test)
          .select(col("label"), col("prediction"),
            when(size(arr) === 2, element_at(arr, 2))
              .otherwise(when(col("prediction") === 1.0, element_at(arr, 1))
                .otherwise(lit(1.0) - element_at(arr, 1))).as("p_similar"))
      }
    }
    // Folds are independent: on large inputs, submit their fits
    // concurrently (the CrossValidator.parallelism pattern — each fit is
    // dozens of jobs, so fold wall-clock is partly scheduling latency and
    // overlapping folds reclaims it; each thread fits its own estimator
    // copy). On SMALL inputs every fold job is pure scheduler round-trip:
    // a thread pool multiplies the concurrent job count 4× for zero data
    // parallelism, which under a loaded host degrades ~4× while the rest
    // of the battery degrades ~1.3× (driver-measured 26.9 s vs 7.0 s idle
    // for the same 8-row smoke). Sequential fits keep the cost flat.
    val poolSize = if (n < 10000L) 1 else math.max(1, math.min(folds, 4))
    val preds =
      if (poolSize == 1) (0 until folds).map(fitFold)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            (0 until folds).map(k => scala.concurrent.Future(fitFold(k)))),
          scala.concurrent.duration.Duration.Inf)
        finally pool.shutdown()
      }
    // Materialize the out-of-fold predictions (gold-bounded: one row per
    // labeled pair) while the fold caches are still warm, then release
    // them — otherwise every battery/bench run leaks two cached relations
    // for the session's lifetime. Callers that keep the result past one
    // evaluation should unpersist it (run() does).
    val out = preds.reduce(_ unionByName _).cache()
    out.count()
    prepared.unpersist()
    labeled.unpersist()
    out
  }

  /** Seeded stratified fold assignment as PURE HASH ARITHMETIC: within
    * each label, rows are ordered by the md5 of their seed-salted id and
    * dealt round-robin over `folds` (Weka's stratified CV shape,
    * `Step5.java:133-148` seeding discipline). Content-hash ordering —
    * not `rand(seed)`, whose draw depends on partition index — makes the
    * assignment a function of the ROW alone: identical under any
    * partitioning, any cluster size, and replayable by any engine with
    * md5 (the DuckDB oracle hash-checks it). Round-robin keeps folds
    * exactly balanced per label, so no fold lacks train data even on
    * tiny gold sets.
    *
    * Appends `fold` ∈ [0, folds). The window partitions by LABEL (one
    * sort task per class): right for gold-standard-bounded CV inputs;
    * for corpus-scale splits use [[hashFolds]], which needs no window.
    */
  def stratifiedFolds(df: DataFrame, idCols: Seq[String],
      labelCol: String, folds: Int, seed: Long = 42L): DataFrame = {
    require(folds >= 2, s"folds=$folds must be >= 2")
    require(idCols.nonEmpty, "need at least one id column")
    val h = md5(concat_ws(":",
      lit(s"cv$seed") +: idCols.map(c => col(c).cast("string")): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(h +: idCols.map(col): _*)
    df.withColumn("fold", ((row_number().over(w) - 1) % folds).cast("int"))
  }

  /** Corpus-scale fold/split assignment with NO window and NO shuffle:
    * `fold = (first 8 hex digits of md5(seed-salted id)) mod folds` — a
    * narrow per-row expression, so it composes with any plan at any
    * scale. Statistically (not exactly) balanced: each fold gets a
    * Binomial(n, 1/folds) share, which at corpus scale is equal to
    * rounding error; on tiny inputs prefer [[stratifiedFolds]]'
    * round-robin. md5-prefix arithmetic (not xxhash64) so the DuckDB
    * oracle replays it digit for digit. The k-FOLD sibling of
    * [[graft.ops.Sampling.contentSplit]]'s weighted named splits (same
    * hash-the-row discipline; that one draws a unit from the TEXT
    * content for leakage-safe train/test cuts, this one deals equal
    * folds from the id for cross-validation).
    */
  def hashFolds(df: DataFrame, idCols: Seq[String], folds: Int,
      seed: Long = 42L, foldCol: String = "fold"): DataFrame = {
    require(folds >= 2, s"folds=$folds must be >= 2")
    require(idCols.nonEmpty, "need at least one id column")
    val h = md5(concat_ws(":",
      lit(s"cv$seed") +: idCols.map(c => col(c).cast("string")): _*))
    df.withColumn(foldCol,
      pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(folds))
        .cast("int"))
  }

  /** [[evaluate]]'s report algebra as ONE declarative aggregation — the
    * oracle-checkable form: confusion counts, accuracy, Cohen's kappa,
    * positive-class and weighted precision/recall/F1, and (when a
    * `p_similar` column is present) Weka's MAE/RMSE, computed from a
    * (label, prediction[, p_similar]) relation in a single one-row
    * DataFrame with the exact zero-denominator conventions of
    * [[evaluate]] (ClassifySpec pins the 1e-12 equivalence). AUC is the
    * one metric left to [[evaluate]] — it needs the rank pass.
    */
  def evaluateDf(predictions: DataFrame): DataFrame = {
    val l = col("label").cast("double")
    val p = col("prediction").cast("double")
    def cell(lv: Double, pv: Double) =
      sum(when(l === lv && p === pv, 1L).otherwise(0L))
    val hasProb = predictions.columns.contains("p_similar")
    val d = if (hasProb) col("p_similar").cast("double") - l else lit(0.0)
    val n = col("tp") + col("fn") + col("fp") + col("tn")
    def ratio(num: Column, den: Column) =
      when(den === 0L, 0.0).otherwise(num.cast("double") / den)
    val prec = ratio(col("tp"), col("tp") + col("fp"))
    val rec = ratio(col("tp"), col("tp") + col("fn"))
    val precN = ratio(col("tn"), col("tn") + col("fn"))
    val recN = ratio(col("tn"), col("tn") + col("fp"))
    def f1Of(pr: Column, rc: Column) =
      when(pr + rc === 0.0, 0.0).otherwise(lit(2.0) * pr * rc / (pr + rc))
    val acc = ratio(col("tp") + col("tn"), n)
    // chance agreement from the margins; kappa 0 at pe = 1 as evaluate()
    val pe = when(n === 0L, 0.0).otherwise(
      ((col("tp") + col("fn")).cast("double") * (col("tp") + col("fp"))
        + (col("tn") + col("fp")).cast("double") * (col("tn") + col("fn")))
        / (n.cast("double") * n.cast("double")))
    val wPos = (col("tp") + col("fn")).cast("double") /
      greatest(n, lit(1L)).cast("double")
    val wNeg = (col("tn") + col("fp")).cast("double") /
      greatest(n, lit(1L)).cast("double")
    predictions
      .agg(cell(1.0, 1.0).as("tp"), cell(1.0, 0.0).as("fn"),
        cell(0.0, 1.0).as("fp"), cell(0.0, 0.0).as("tn"),
        coalesce(avg(abs(d)), lit(0.0)).as("mae"),
        coalesce(sqrt(avg(d * d)), lit(0.0)).as("rmse"))
      .select(n.as("n"), col("tp"), col("fn"), col("fp"), col("tn"),
        acc.as("accuracy"),
        when(pe === 1.0, 0.0).otherwise((acc - pe) / (lit(1.0) - pe))
          .as("kappa"),
        prec.as("precision_similar"), rec.as("recall_similar"),
        f1Of(prec, rec).as("f1_similar"),
        (wPos * prec + wNeg * precN).as("weighted_precision"),
        (wPos * rec + wNeg * recN).as("weighted_recall"),
        (wPos * f1Of(prec, rec) + wNeg * f1Of(precN, recN))
          .as("weighted_f1"),
        col("mae"), col("rmse"))
  }

  /** Confusion-matrix evaluation of out-of-fold predictions ("similar" =
    * the positive class, as in `README.md:150-154`).
    */
  def evaluate(predictions: DataFrame, folds: Int = 10): Report = {
    val counts = predictions
      .groupBy(col("label"), col("prediction")).count()
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    val tp = counts((1.0, 1.0)); val fn = counts((1.0, 0.0))
    val fp = counts((0.0, 1.0)); val tn = counts((0.0, 0.0))
    val n = tp + fn + fp + tn
    val prec = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val rec = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    val accuracy = if (n == 0) 0.0 else (tp + tn).toDouble / n
    // Cohen's kappa: observed vs chance agreement from the margins
    val pe = if (n == 0) 0.0
      else ((tp + fn).toDouble * (tp + fp) + (tn + fp).toDouble * (tn + fn)) /
        (n.toDouble * n)
    val kappa = if (pe == 1.0) 0.0 else (accuracy - pe) / (1 - pe)
    // negative-class and weighted one-vs-rest metrics (Weka's summary rows)
    val precN = if (tn + fn == 0) 0.0 else tn.toDouble / (tn + fn)
    val recN = if (tn + fp == 0) 0.0 else tn.toDouble / (tn + fp)
    val f1N = if (precN + recN == 0) 0.0 else 2 * precN * recN / (precN + recN)
    val wPos = (tp + fn).toDouble / math.max(1L, n)
    val wNeg = (tn + fp).toDouble / math.max(1L, n)
    val (mae, rmse) = errorMetrics(predictions)
    Report(folds, n, accuracy, kappa, aucFromScores(predictions),
      prec, rec, f1,
      wPos * prec + wNeg * precN, wPos * rec + wNeg * recN,
      wPos * f1 + wNeg * f1N,
      mae, rmse,
      tp, fn, fp, tn)
  }

  /** Weka's MAE/RMSE for a classifier (`README.md:114-115,143-144` of the
    * reference; Weka `Evaluation.updateNumericScores`): per instance, the
    * class-probability vector is compared against the 0/1 indicator vector
    * and the per-class differences are averaged. For two classes both
    * differences have the same magnitude |P(similar) − label|, so
    * MAE = mean |p − y| and RMSE = sqrt(mean (p − y)²) over the
    * out-of-fold P(similar).
    */
  private def errorMetrics(predictions: DataFrame): (Double, Double) = {
    if (!predictions.columns.contains("p_similar")) return (0.0, 0.0)
    val d = col("p_similar") - col("label")
    val r = predictions.agg(
      avg(abs(d)).as("mae"), sqrt(avg(d * d)).as("rmse")).head()
    (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
      if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** ROC area for the positive class via the Mann-Whitney rank statistic
    * over P(similar), with average ranks for ties — computed distributed
    * with NO single-partition global window (the textbook scale-killer):
    * a range-partitioned sort puts every tie group wholly inside one
    * partition, pass 1 collects per-partition row counts (tiny: one long
    * per partition), pass 2 turns those into rank offsets and accumulates
    * the positive-class rank sum per partition.
    */
  private def aucFromScores(predictions: DataFrame): Double = {
    if (!predictions.columns.contains("p_similar")) return 0.0
    val sc = predictions.sparkSession.sparkContext
    val scored = predictions
      .select(col("p_similar").cast("double"), col("label").cast("double"))
      .rdd.map(r => (r.getDouble(0), r.getDouble(1) == 1.0))
    if (scored.isEmpty()) return 0.0
    // RangePartitioner keeps equal keys in one partition, so tie groups
    // never straddle a boundary and average ranks stay exact.
    val sorted = scored.sortByKey(ascending = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = sorted
        .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)),
          preservesPartitioning = true)
        .collect().sortBy(_._1).map(_._2)
      val offsets = sc.broadcast(sizes.scanLeft(0L)(_ + _))
      val (posRankSum, npos, nneg) = sorted.mapPartitionsWithIndex {
        (pid, it) =>
          var rank = offsets.value(pid) // rows in partitions before this one
          var prs = 0.0; var np = 0L; var nn = 0L
          val buf = it.buffered
          while (buf.hasNext) {
            val s = buf.head._1
            var cnt = 0L; var pos = 0L
            // bit-compare, not ==: a NaN score must form (and terminate)
            // its own tie group — `NaN == NaN` is false and would spin
            // this loop forever without consuming the element
            while (buf.hasNext &&
                java.lang.Double.compare(buf.head._1, s) == 0) {
              if (buf.next()._2) pos += 1
              cnt += 1
            }
            // ranks rank+1 .. rank+cnt share the average rank
            prs += pos * (rank + (cnt + 1) / 2.0)
            np += pos; nn += cnt - pos
            rank += cnt
          }
          Iterator((prs, np, nn))
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      if (npos == 0 || nneg == 0) 0.0
      else (posRankSum - npos.toDouble * (npos + 1) / 2) /
        (npos.toDouble * nneg)
    } finally sorted.unpersist(blocking = false)
  }

  /** End-to-end: vectors → CV → report (the engine's `classify` entry,
    * reference entry point 3, `WekaModel.java:176-207`).
    */
  def run(vectors: DataFrame, folds: Int = 10, seed: Long = 42L): Report = {
    val preds = crossValPredictions(vectors, folds, seed)
    try evaluate(preds, folds) finally preds.unpersist()
  }
}
