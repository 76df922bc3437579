package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.PairVectors

/** ARFF export of the 24-dim vectors relation — reference S8
  * (`Step5.java:78-123`): the exact attribute names/order of the reference
  * header, data lines as comma-joined `Double.toString` values + the
  * nominal class (`similar` / `not-similar`).
  *
  * Two shapes: [[dataLines]] is the distributed relation (write with
  * `.write.text`); [[writeLocal]] materializes header + data to one local
  * file like the reference's driver-side writer.
  */
object ArffSink {

  /** The reference's attribute names, in order (`Step5.java:80-86`). */
  val attributeNames: Seq[String] = {
    val measures = Seq("freq", "prob", "PMI", "t-test")
    val metrics = Seq("distManhattan", "distEuclidean", "simCosine",
      "simJaccard", "simDice", "simJS")
    for (m <- measures; t <- metrics) yield s"${m}_$t"
  }

  val header: String =
    "@relation semantic_similarity\n\n" +
      attributeNames.map(a => s"@attribute $a numeric\n").mkString +
      "@attribute class {similar, not-similar}\n\n@data\n"

  /** Vectors DF → one `value: String` column of ARFF data rows. */
  def dataLines(vectors: DataFrame): DataFrame = {
    val nums = PairVectors.vectorColumns.map(c => format_string("%s", col(c)))
    val label = when(col("related"), "similar").otherwise("not-similar")
    vectors.select(concat_ws(",", nums :+ label: _*).as("value"))
  }

  /** Driver-side single-file export (reference entry-point parity). */
  def writeLocal(vectors: DataFrame, path: String): Unit = {
    val rows = dataLines(vectors).collect().map(_.getString(0))
    Files.writeString(Paths.get(path), header + rows.mkString("\n") + "\n")
  }
}
