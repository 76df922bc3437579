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
}
