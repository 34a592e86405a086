package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted joins must be row-identical to the plain join on every corpus —
  * skewed, uniform, and hot-key-free — while fanning hot keys across salts. */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 10,000 rows on key "hot" plus a uniform tail of 50 keys x 20 rows
  private lazy val fact = (
    (1 to 10000).map(i => ("hot", s"r$i", i.toDouble)) ++
    (1 to 1000).map(i => (s"k${i % 50}", s"t$i", i.toDouble))
  ).toDF("key", "row_id", "v")

  private lazy val dim = (("hot" +: (0 until 50).map(i => s"k$i")) :+ "unmatched")
    .map(k => (k, s"name_$k")).toDF("key", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
    df.select("key", "row_id", "name").as[(String, String, String)]
      .collect().sorted.toSeq

  private lazy val plain = canon(fact.join(dim, Seq("key")))

  test("saltedJoin matches the plain join exactly") {
    assert(plain.size == 11000)
    assert(canon(SkewJoin.saltedJoin(fact, dim, "key", "row_id", salt = 8)) == plain)
  }

  test("saltedJoin spreads a hot key over multiple salts") {
    val salts = fact.filter($"key" === "hot")
      .withColumn("__salt", pmod(xxhash64($"row_id"), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts == 8, s"expected the hot key to use all 8 salts, got $salts")
  }

  test("saltedJoinHotKeys matches the plain join and replicates only hot keys") {
    assert(canon(SkewJoin.saltedJoinHotKeys(fact, dim, "key", "row_id",
      salt = 8, hotThreshold = 100)) == plain)
  }

  test("saltedJoinHotKeys with no hot keys degrades to the plain join") {
    assert(canon(SkewJoin.saltedJoinHotKeys(fact, dim, "key", "row_id",
      salt = 8, hotThreshold = 1000000)) == plain)
  }

  test("salt=1 is the identity salting") {
    assert(canon(SkewJoin.saltedJoin(fact, dim, "key", "row_id", salt = 1)) == plain)
  }
}
