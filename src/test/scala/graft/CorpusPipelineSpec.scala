package graft

import org.apache.spark.sql.functions._

import graft.jobs.CorpusPipeline
import graft.sources.Tables

/** Pipeline invariants the composed corpus-cleaning job must hold. */
class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cleaned =
    CorpusPipeline.clean(Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text").cache()

  test("output has no identical texts and respects the quality gate") {
    val n = cleaned.count()
    assert(n > 0)
    assert(cleaned.select("text").distinct().count() == n, "exact dups must be gone")
    assert(cleaned.filter(col("quality_score") < 0.7).count() == 0)
    assert(cleaned.filter(col("lang_pred") === "und").count() == 0)
  }

  test("every surviving doc has a split and ids are a subset of the input") {
    assert(cleaned.filter(col("split").isNull).count() == 0)
    val inputIds = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id").as[Long].collect().toSet
    cleaned.select("doc_id").as[Long].collect().foreach(id => assert(inputIds(id)))
  }

  test("near-dup pairs above threshold never survive together") {
    val pairs = graft.operators.Dedup.minhashLsh(
      cleaned.select("doc_id", "text"), "doc_id", "text",
      k = 5, bands = 4, rowsPerBand = 4, threshold = 0.5)
    assert(pairs.count() == 0, "cleaned corpus must contain no detectable near-dups")
  }

  test("clusterDedup keeps at most one doc per near-dup component, subset of pair mode") {
    val clustered = CorpusPipeline.clean(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", clusterDedup = true)
    // cluster mode can only delete MORE than pair mode (transitive members)
    val pairIds = cleaned.select("doc_id").as[Long].collect().toSet
    val clusterIds = clustered.select("doc_id").as[Long].collect().toSet
    assert(clusterIds.subsetOf(pairIds))
    // and its output is also free of detectable near-dups
    val residual = graft.operators.Dedup.minhashLsh(
      clustered.select("doc_id", "text"), "doc_id", "text",
      k = 5, bands = 4, rowsPerBand = 4, threshold = 0.5)
    assert(residual.count() == 0)
  }

  test("an opt-in benchmark drops exactly the contaminated survivors") {
    // benchmark = the texts of some docs that survive the default pipeline;
    // with threshold 0.5 those docs (overlap 1.0) must vanish, and every
    // other surviving doc must be unaffected
    val benchIds = cleaned.select("doc_id").as[Long].collect().toSet.take(5)
    val bench = cleaned.filter(col("doc_id").isInCollection(benchIds))
      .select("doc_id", "text")
    val gated = CorpusPipeline.clean(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", benchmark = Some(bench))
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    val baseIds = cleaned.select("doc_id").as[Long].collect().toSet
    assert(benchIds.forall(!gatedIds.contains(_)), "benchmark members must be dropped")
    val dropped = baseIds -- gatedIds
    // everything dropped beyond the seeds is genuinely contaminated
    val verify = graft.operators.Decontaminate.contamination(
        cleaned.select("doc_id", "text"), bench, "doc_id", "text", n = 3)
      .filter(col("contaminated") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(dropped == verify)
  }

  test("opt-in mixTargets rebalances the SURVIVING corpus to the target mix") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = CorpusPipeline.clean(docs, "doc_id", "text")
    val mixed = CorpusPipeline.clean(docs, "doc_id", "text",
      mixTargets = Some(Seq("src0" -> 0.5, "src1" -> 0.5)))
    // only targeted strata survive, membership is a subset of the unmixed run
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    val mixedRows = mixed.select("doc_id", "source").as[(Long, String)].collect()
    assert(mixedRows.map(_._2).toSet.subsetOf(Set("src0", "src1")))
    assert(mixedRows.map(_._1).toSet.subsetOf(baseIds))
    // the binding stratum (fewer survivors relative to target) is kept whole
    val survivorCounts = base.filter(col("source").isin("src0", "src1"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val mixedCounts = mixedRows.groupBy(_._2).view.mapValues(_.length).toMap
    val binding = survivorCounts.minBy(c => c._2 / 0.5)._1
    assert(mixedCounts(binding) == survivorCounts(binding))
  }
}
