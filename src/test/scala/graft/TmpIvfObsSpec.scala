package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

class TmpIvfObsSpec extends AnyFunSuite with SparkTestBase {
  test("ivfIndex survives an initialized ObservationManager") {
    val s2 = spark; import s2.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    graft.ops.Dedup.spillCertificate(docs, 3).collect()
    val emb = (1L to 40L).map(i =>
      (i, Array.tabulate(4)(d => ((i * (d + 1)) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val (cents, assigned) = Similarity.ivfIndex(emb, 3, seed = 7L)
    assert(cents.count() == 3L)
    assert(assigned.count() == 40L)
  }
}
