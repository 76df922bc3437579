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
        // smoke-sized forest: 5 trees × 4 sequential folds keeps the MLlib
        // job count low enough that the entry's cost is stable under host
        // contention (the full-size path is ClassifySpec/EndToEndMlSpec)
        val preds = Classify.crossValPredictions(vecs, folds = 4, seed = 42L,
          numTrees = 5)
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

    // S3-style faithful text rendering of the assoc relation, checked at
    // the VALUE level: the rendered lines (byte format pinned by the
    // ByteParitySpec goldens — Java Double.toString has no DuckDB
    // equivalent) are parsed BACK into typed columns, proving the
    // render/parse round trip, and the oracle recomputes the same measures
    // independently. Double.toString is exact-round-trip, so the parsed
    // doubles are bit-identical to the computed ones.
    QueryDef("q61_faithful_assoc_lines",
      (s, d) => {
        val lines = FaithfulText.assocLines(DocPipelineAccess.assoc(s, d))
        val key = split(split(col("value"), "\t").getItem(0), " ")
        def metric(name: String) =
          regexp_extract(col("value"), name + "=([^ ]+)", 1).cast("double")
        lines.select(
          key.getItem(0).as("lexeme"),
          key.getItem(1).as("feature"),
          metric("assoc_freq").as("assoc_freq"),
          metric("assoc_prob").as("assoc_prob"),
          metric("assoc_PMI").as("assoc_pmi"),
          metric("assoc_t_test").as("assoc_ttest"))
          .orderBy("lexeme", "feature")
      },
      Some(s"""WITH ${DocPipeline.assocSql}
              |SELECT lexeme, feature, assoc_freq, assoc_prob, assoc_pmi,
              |  assoc_ttest
              |FROM assoc ORDER BY 1, 2""".stripMargin)),
  )
}

/** Exposes DocPipeline's internal assoc builder to sibling query modules. */
private[queries] object DocPipelineAccess {
  def assoc(s: org.apache.spark.sql.SparkSession, d: String) =
    DocPipeline.docAssocPublic(s, d)
}
