package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: stable under reruns and repartitioning, correct
  * proportions, total and disjoint split assignment. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.range(20000).select(col("id").as("doc_id"))

  test("sample is identical across reruns and physical layouts") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02, s"got ${a.size}")
  }

  test("growing the fraction only adds rows (nested samples)") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val large = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("assignSplit covers every row exactly once with ~right proportions") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01, counts.toString)
    // same id never changes split
    val again = Sampling.assignSplit(docs.repartition(7), "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val pairs = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    again.select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, s) => assert(pairs(id) == s) }
  }

  test("weights must sum to one; fraction must be in range") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(docs, "doc_id", 1.5)
    }
  }
}
