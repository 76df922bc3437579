package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.nfc_normalize

/** NFC canonical composition as a native expression: equivalence classes
  * collapse to identical bytes (the property every hash-keyed operator
  * depends on), SQL registration works, nulls pass through, and a
  * foldable child constant-folds out of the plan.
  */
class NfcNormalizeSpec extends AnyFunSuite with SparkTestBase {

  private val decomposed = "cafe\u0301"  // e + COMBINING ACUTE ACCENT
  private val precomposed = "caf\u00e9"  // precomposed single codepoint

  test("canonical equivalents normalize to identical bytes") {
    val s2 = spark; import s2.implicits._
    val out = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), nfc_normalize(col("t")).as("n"),
        length(nfc_normalize(col("t"))).as("len"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(out(1L) == out(2L), s"got $out")
    assert(out(1L)._2 == 4) // 5 codepoints composed to 4
    assert(out(3L) == (("plain ascii", 11))) // ASCII short-circuit identity
    // dedup consequence: md5 of the two forms now collides (the point)
    val hashes = Seq(decomposed, precomposed).toDF("t")
      .select(md5(nfc_normalize(col("t")))).distinct().count()
    assert(hashes == 1)
  }

  test("SQL registration and null passthrough") {
    graft.functions.registerAll(spark)
    val got = spark.sql(
      s"SELECT nfc_normalize('$decomposed'), " +
        "nfc_normalize(CAST(NULL AS STRING))").head
    assert(got.getString(0) == precomposed && got.isNullAt(1))
  }

  test("foldable input constant-folds out of the plan") {
    val df = spark.range(1)
      .select(nfc_normalize(lit(decomposed)).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("nfc_normalize"), optimized)
    assert(df.head.getString(0) == precomposed)
  }
}
