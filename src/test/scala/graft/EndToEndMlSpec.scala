package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Classify
import graft.pipeline._
import graft.queries.PipelineBench

/** End-to-end ML validation on STRUCTURED synthetic data: the corpus has
  * genuine distributional structure (topic-sliced word draws), so the
  * Random Forest over the real pipeline's 24-dim vectors must separate
  * same-topic from cross-topic pairs — the engine-side analog of the
  * reference's 93.4%-accuracy acceptance run (`README.md:139-147`), which
  * is not reproducible verbatim without the proprietary-scale corpus.
  */
class EndToEndMlSpec extends AnyFunSuite with SparkTestBase {

  test("pipeline vectors on a structured corpus are learnable (CV accuracy)") {
    val corpus = PipelineBench.structuredCorpus(spark, 150000L, 8, topics = 10)
    val counts = Counts.fromEdges(Biarcs.edges(corpus))
    val assoc = Associate.associate(counts)
    val s2 = spark; import s2.implicits._
    val gold = PipelineBench.structuredGold(10).toDF("w1", "w2", "related")
    val vecs = PairVectors.vectors(assoc, gold)
    val n = vecs.count()
    assert(n >= 30, s"expected a usable instance count, got $n")
    val report = Classify.evaluate(
      Classify.crossValPredictions(vecs, folds = 5, seed = 42L, numTrees = 40),
      folds = 5)
    counts.unpersist()
    assert(report.nInstances == n)
    // same-topic pairs share contexts, cross-topic pairs don't: the
    // classifier must do far better than the majority class
    assert(report.accuracy >= 0.75, s"accuracy ${report.accuracy}\n${report.render}")
    assert(report.aucSimilar >= 0.8, s"auc ${report.aucSimilar}")
  }
}
