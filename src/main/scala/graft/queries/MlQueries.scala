package graft.queries

import org.apache.spark.sql.functions._

import graft.io.FaithfulText
import graft.ml.Classify
import graft.pipeline.PairVectors

/** ML-evaluation and faithful-sink surfaces as battery entries (rows-only:
  * RandomForest and text rendering have no DuckDB equivalents; semantics
  * are pinned by ClassifySpec / the format doc-tests instead).
  */
object MlQueries {

  val all: Seq[QueryDef] = Seq(

    // M1-M4: assemble → RF → seeded stratified 10-fold CV → report row
    QueryDef("q60_classify_report",
      (s, d) => {
        val gold = {
          val s2 = s; import s2.implicits._
          Seq(("join", "merge", true), ("sort", "order", true),
            ("scan", "filter", true), ("hash", "join", true),
            ("fast", "slow", false), ("big", "small", false),
            ("table", "row", false), ("spark", "stream", false))
            .toDF("w1", "w2", "related")
        }
        val vecs = PairVectors.vectors(DocPipelineAccess.assoc(s, d), gold)
        val preds = Classify.crossValPredictions(vecs, folds = 4, seed = 42L,
          numTrees = 10)
        val r = try Classify.evaluate(preds, folds = 4)
          finally preds.unpersist()
        val s2 = s; import s2.implicits._
        Seq((r.nInstances, r.accuracy, r.kappa, r.aucSimilar,
          r.precisionSimilar, r.recallSimilar, r.f1Similar, r.mae, r.rmse,
          r.tp, r.fn, r.fp, r.tn))
          .toDF("n_instances", "accuracy", "kappa", "auc_similar",
            "precision_similar", "recall_similar", "f1_similar",
            "mae", "rmse",
            "tp", "fn", "fp", "tn")
      },
      None),

    // S8-style faithful text rendering of the assoc relation
    QueryDef("q61_faithful_assoc_lines",
      (s, d) => FaithfulText.assocLines(DocPipelineAccess.assoc(s, d))
        .orderBy("value"),
      None),
  )
}

/** Exposes DocPipeline's internal assoc builder to sibling query modules. */
private[queries] object DocPipelineAccess {
  def assoc(s: org.apache.spark.sql.SparkSession, d: String) =
    DocPipeline.docAssocPublic(s, d)
}
