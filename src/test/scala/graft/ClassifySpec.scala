package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Classify
import graft.pipeline.{PairVectors, SemanticPipeline}

class ClassifySpec extends AnyFunSuite with SparkTestBase {

  /** Deterministic synthetic 24-dim vectors: related pairs get
    * high-similarity / low-distance profiles, unrelated the opposite, with
    * id-derived pseudo-noise — separable, so CV accuracy must be high.
    */
  private def syntheticVectors(n: Int) = {
    val base = spark.range(n.toLong).toDF("id")
      .withColumn("related", col("id") % 4 === 0)
      .withColumn("noise", sin(col("id").cast("double")) * 0.05)
    PairVectors.vectorColumns.zipWithIndex.foldLeft(
      base.withColumn("w1", concat(lit("a"), col("id")))
        .withColumn("w2", concat(lit("b"), col("id")))) {
      case (df, (c, i)) =>
        val sim = c.endsWith("cosine") || c.endsWith("jaccard") || c.endsWith("dice")
        val high = when(col("related"), lit(if (sim) 0.9 else 2.0))
          .otherwise(lit(if (sim) 0.1 else 40.0))
        df.withColumn(c, high + col("noise") * (i + 1))
    }
  }

  test("cross-validated RF separates a separable problem") {
    val report = Classify.evaluate(
      Classify.crossValPredictions(syntheticVectors(800), folds = 5,
        seed = 42L, numTrees = 20))
    assert(report.nInstances == 800)
    assert(report.accuracy > 0.95, s"accuracy ${report.accuracy}")
    assert(report.tp + report.fn == 200) // positives preserved
    assert(report.tp + report.fn + report.fp + report.tn == 800)
    assert(report.f1Similar > 0.9)
    assert(report.kappa > 0.85, s"kappa ${report.kappa}")
    assert(report.aucSimilar > 0.95, s"auc ${report.aucSimilar}")
    assert(report.weightedF1 > 0.9)
    assert(report.render.contains("Confusion matrix"))
  }

  test("hand-rolled metrics agree with spark.ml's MulticlassClassificationEvaluator") {
    import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
    val preds = Classify.crossValPredictions(syntheticVectors(400), folds = 4,
      seed = 11L, numTrees = 15).cache()
    val report = Classify.evaluate(preds, 4)
    def ev(metric: String) = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName(metric).evaluate(preds)
    assert(math.abs(report.accuracy - ev("accuracy")) < 1e-12)
    assert(math.abs(report.weightedPrecision - ev("weightedPrecision")) < 1e-12)
    assert(math.abs(report.weightedRecall - ev("weightedRecall")) < 1e-12)
    assert(math.abs(report.weightedF1 - ev("weightedFMeasure")) < 1e-9)
    preds.unpersist()
  }

  test("distributed AUC matches BinaryClassificationEvaluator; MAE/RMSE match hand-computed") {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    val preds = Classify.crossValPredictions(syntheticVectors(400), folds = 4,
      seed = 11L, numTrees = 15).cache()
    val report = Classify.evaluate(preds, 4)
    // trapezoid AUC over score thresholds == Mann-Whitney with average ranks
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("p_similar")
      .setMetricName("areaUnderROC").evaluate(preds)
    assert(math.abs(report.aucSimilar - auc) < 1e-9,
      s"auc ${report.aucSimilar} vs evaluator $auc")
    // Weka binary-case MAE/RMSE on out-of-fold P(similar)
    val rows = preds.select("p_similar", "label").collect()
    val diffs = rows.map(r => r.getDouble(0) - r.getDouble(1))
    val mae = diffs.map(math.abs).sum / diffs.length
    val rmse = math.sqrt(diffs.map(d => d * d).sum / diffs.length)
    assert(math.abs(report.mae - mae) < 1e-9, s"mae ${report.mae} vs $mae")
    assert(math.abs(report.rmse - rmse) < 1e-9,
      s"rmse ${report.rmse} vs $rmse")
    assert(report.render.contains("Mean absolute error"))
    preds.unpersist()
  }

  test("evaluate terminates and degrades sanely on NaN scores") {
    val s2 = spark; import s2.implicits._
    // NaN == NaN is false: a naive tie-group loop would never consume the
    // NaN row and spin forever — this pins the bit-compare fix
    val preds = Seq(
      (1.0, 1.0, 0.9), (0.0, 0.0, 0.1), (1.0, 1.0, Double.NaN),
      (0.0, 1.0, 0.4))
      .toDF("label", "prediction", "p_similar")
    val report = Classify.evaluate(preds, folds = 2)
    assert(report.nInstances == 4)
    assert(!report.accuracy.isNaN)
  }

  test("seeded CV is reproducible") {
    val v = syntheticVectors(200)
    val r1 = Classify.evaluate(Classify.crossValPredictions(v, 3, 7L, 10))
    val r2 = Classify.evaluate(Classify.crossValPredictions(v, 3, 7L, 10))
    assert(r1 == r2)
  }

  test("end-to-end on the reference fixtures (smoke: tiny gold standard)") {
    val vecs = SemanticPipeline.vectors(spark,
      "/root/reference/small-sample.txt",
      "/root/reference/test_gold_standard.txt")
    val report = Classify.run(vecs, folds = 2)
    assert(report.nInstances == 4)
    assert(report.tp + report.fn == 1) // one related pair (about, us)
  }
}
