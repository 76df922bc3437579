package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted join returns exactly the plain join's result on skewed keys") {
    val s2 = spark; import s2.implicits._
    // 10k rows, 90% on one hot key — the shape AQE splits and salting routes
    val big = spark.range(10000)
      .select(when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id")))
        .as("key"), col("id").as("v"))
    val small = Seq(("hot", 1), ("k3", 2), ("k13", 3), ("absent", 4))
      .toDF("key", "w")
    val plain = big.join(small, Seq("key")).select("key", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val salted = Skew.saltedJoin(big, small, "key", salt = 8)
      .select("key", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("bloom-pruned join returns exactly the plain join and the probe " +
      "filter sits below the join") {
    val s2 = spark; import s2.implicits._
    val big = spark.range(5000)
      .select(col("id").as("bk"), (col("id") * 7 % 100).as("v"))
    // small matches a 1% slice; 'absent' keys must not leak through
    val small = (1 to 50).map(i => (i * 100L, i))
      .toDF("sk", "w")
    val plain = big.join(small, col("bk") === col("sk"))
      .select("bk", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val viaBloom = Skew.bloomPrunedJoin(big, small, "bk", "sk",
        numBits = 1 << 12, numHashes = 3)
      .select("bk", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(viaBloom.sameElements(plain),
      s"${viaBloom.length} vs ${plain.length}")
    // the Bloom probe must prune BEFORE the join, as a narrow filter
    val p = Skew.bloomPrunedJoin(big, small, "bk", "sk")
      .queryExecution.executedPlan.toString
    assert(p.contains("forall"), p)
  }

  test("bloom-pruned join: identically-named key columns resolve via " +
      "the side aliases instead of dying ambiguous") {
    val s2 = spark; import s2.implicits._
    val big = Seq(1L, 2L, 3L, 4L, 5L).toDF("key")
    val small = Seq(2L, 4L).toDF("key")
    val got = Skew.bloomPrunedJoin(big, small, "key", "key",
      numBits = 1 << 10, numHashes = 3)
    assert(got.count() == 2)
    assert(got.select(col("__graft_big.key")).collect()
      .map(_.getLong(0)).sorted.sameElements(Array(2L, 4L)))
    // reserved internal names fail fast instead of shadowing
    val clash = Seq((1L, Seq(0L))).toDF("key", "__graft_bloom")
    val e = intercept[IllegalArgumentException] {
      Skew.bloomPrunedJoin(clash, small, "key", "key")
    }
    assert(e.getMessage.contains("__graft_bloom"))
  }
}
