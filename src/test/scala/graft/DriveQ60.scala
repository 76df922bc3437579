package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch: phase-time q60 and q62 at sf0.1. */
object DriveQ60 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$d/documents.parquet").count()
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(l: String): Unit = {
        println(f"  $l: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      // q60 phases
      val gold = {
        import spark.implicits._
        Seq(("join", "merge", true), ("sort", "order", true),
          ("scan", "filter", true), ("hash", "join", true),
          ("fast", "slow", false), ("big", "small", false),
          ("table", "row", false), ("spark", "stream", false))
          .toDF("w1", "w2", "related")
      }
      val assoc = DocPipelineAccess.assoc(spark, d)
      val vecs = graft.pipeline.PairVectors.vectors(assoc, gold)
      vecs.count()
      lap("q60 assoc+vectors+count")
      val preds = graft.ml.Classify.crossValPredictions(vecs, folds = 4,
        seed = 42L, numTrees = 5)
      lap("q60 crossVal (4 folds x 5 trees)")
      val r = try graft.ml.Classify.evaluate(preds, folds = 4)
        finally preds.unpersist()
      lap(s"q60 evaluate (acc=${r.accuracy})")
      // q62 phases
      val lines = spark.read.parquet(s"$d/documents.parquet").count() * 200L
      val corpus = graft.queries.PipelineBench.syntheticCorpus(spark, lines, 8)
      val counts = graft.pipeline.Counts.fromEdges(graft.pipeline.Biarcs.edges(corpus))
      lap("q62 corpus+edges+counts (incl total action)")
      val a2 = graft.pipeline.Associate.associate(counts)
      val res = graft.pipeline.PairVectors.vectors(a2, gold.where(col("related").isNotNull)).orderBy("w1", "w2")
      val rows = res.collect()
      counts.unpersist()
      lap(s"q62 assoc+vectors+collect rows=${rows.length}")
      println(s"iter $i done")
    }
    spark.stop()
  }
}
