package graft

import org.apache.spark.sql.functions._

import graft.Functions._
import graft.operators.{Dedup, SemiJoinReduction}

/** Bloom semi-join reduction: no false negatives (the load-bearing
  * property), bounded false positives, merge correctness across layouts,
  * and join-result equivalence. */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom has no false negatives regardless of physical layout") {
    val keys = spark.range(2000).select(col("id"))
    val bloom = keys.agg(bloom_agg(col("id"), 1 << 14, 5).as("b"))
    val misses = keys.crossJoin(broadcast(bloom))
      .filter(!bloom_contains(col("b"), col("id"), 1 << 14, 5))
      .count()
    assert(misses == 0)
    // merge path: a 13-partition build produces the identical bitset
    val bloomParts = keys.repartition(13).agg(bloom_agg(col("id"), 1 << 14, 5).as("b"))
    assert(bloom.as[Seq[Long]].head() == bloomParts.as[Seq[Long]].head())
  }

  test("false-positive rate is in the expected range at ~8 bits/key") {
    // 2000 keys in 2^14 bits, k=5 -> theoretical fpp ~ 2.2%
    val keys = spark.range(2000).select(col("id"))
    val bloom = keys.agg(bloom_agg(col("id"), 1 << 14, 5).as("b"))
    val nonMembers = spark.range(1000000, 1020000).select(col("id"))
    val fp = nonMembers.crossJoin(broadcast(bloom))
      .filter(bloom_contains(col("b"), col("id"), 1 << 14, 5))
      .count()
    assert(fp > 0 && fp < 2000, s"fpp wildly off: $fp / 20000") // < 10%
  }

  test("bloomJoin result is identical to the plain join") {
    val fact = spark.range(5000).select(col("id").as("fk"),
      (col("id") * 3 % 100).as("v"))
    val dim = spark.range(100).select((col("id") * 7).as("dk"),
      concat(lit("n"), col("id")).as("name"))
    val got = SemiJoinReduction.bloomJoin(fact, dim, "fk", "dk",
        numBits = 1 << 10, numHashes = 4)
      .select("fk", "v", "dk", "name")
      .as[(Long, Long, Long, String)].collect().toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "dk", "name")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == plain)
  }

  test("null fact keys never pass the probe; null dim keys set no bits") {
    val dim = Seq(Some(1L), None, Some(2L)).toDF("dk")
    val bloom = dim.agg(bloom_agg(col("dk"), 64, 3).as("b"))
    val fact = Seq(Some(1L), None, Some(99L)).toDF("fk")
    val kept = fact.crossJoin(broadcast(bloom))
      .filter(bloom_contains(col("b"), col("fk"), 64, 3))
      .select("fk").as[Option[Long]].collect().toSet
    assert(kept.contains(Some(1L)) && !kept.contains(None))
  }

  test("bloom_agg validates its parameters") {
    intercept[IllegalArgumentException] {
      graft.functions.BloomAgg(null, numBits = 100, numHashes = 5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.BloomAgg(null, numBits = 64, numHashes = 0)
    }
  }

  test("bloomAntiJoin equals plain left_anti, even with forced false positives") {
    // 64 bits for 200 build keys: nearly every probe is a false positive,
    // so the confirm join does all the work — result must not change
    val build = spark.range(200).select((col("id") * 3).as("bk"))
    val fact = spark.range(500).select(col("id").as("fk"),
      concat(lit("p"), col("id")).as("v"))
    val got = SemiJoinReduction.bloomAntiJoin(fact, build, "fk", "bk",
        numBits = 64, numHashes = 3)
      .select("fk", "v").as[(Long, String)].collect().toSet
    val plain = fact.join(build, col("fk") === col("bk"), "left_anti")
      .select("fk", "v").as[(Long, String)].collect().toSet
    assert(got == plain && got.nonEmpty)
  }

  test("bloomAntiJoin: null fact keys survive (left_anti null-never-matches)") {
    val build = Seq("a", "b").toDF("bk")
    val fact = Seq(Some("a"), None, Some("z")).toDF("fk")
    val got = SemiJoinReduction.bloomAntiJoin(fact, build, "fk", "bk",
        numBits = 256, numHashes = 3)
      .select("fk").as[Option[String]].collect().toSet
    assert(got == Set(None, Some("z")))
  }

  test("bloomIncrementalExact: min-id wins in-batch, corpus texts drop, novel survive") {
    val corpus = Seq((1L, "seen one"), (2L, "seen two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen one"),  // exact corpus dup -> dropped
      (11L, "brand new"), // novel -> survives
      (13L, "twice in batch"), (12L, "twice in batch"), // min-id 12 survives
      (14L, null.asInstanceOf[String]), (15L, null.asInstanceOf[String]) // one null row survives
    ).toDF("doc_id", "text")
    val got = Dedup.bloomIncrementalExact(corpus, batch, "doc_id", "text",
        numBits = 256, numHashes = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L, 14L))
  }
}
