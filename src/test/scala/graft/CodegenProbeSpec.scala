package graft

import org.apache.spark.sql.functions._

import graft.Functions._

/** The fused kernels must not break whole-stage codegen: the project that
  * evaluates them carries the `*(n)` WholeStageCodegen marker instead of
  * falling back to interpreted evaluation. */
class CodegenProbeSpec extends SparkTestBase {
  test("minhash/simhash/parse_money stay inside WholeStageCodegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(col("doc_id"),
      minhash_signature(col("text"), 5, 16).as("sig"),
      simhash_fused(col("text"), 32).as("sh"),
      parse_money(col("text")).as("pm"))
    df.collect() // force codegen compilation (a fallback would throw or re-plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"project not whole-stage-codegen'd:\n$plan")
  }

  test("round-4 kernels (quality/term_counts/pq_encode) stay inside WholeStageCodegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cb = graft.operators.Similarity.pqCodebookQ(2, 4, 4)
    val df = docs.select(col("doc_id"),
      quality_signals(col("text")).as("q"),
      term_counts(col("text"), 3).as("tc"),
      pq_encode(array_repeat(col("n_chars").cast("double"), 8), cb, 2, 4).as("codes"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"project not whole-stage-codegen'd:\n$plan")
  }

  test("round-6 broadcast-codebook kernels stay inside WholeStageCodegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bc = spark.sparkContext.broadcast(
      Array(Array.fill(64)(0.1), Array.fill(64)(-0.2)))
    val df = emb.select(col("vec_id"),
      cell_assign(col("embedding"), bc).as("cell"),
      cell_scores(col("embedding"), bc).as("scores"),
      centroid_at(cell_assign(col("embedding"), bc), bc).as("cent"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"project not whole-stage-codegen'd:\n$plan")
  }
}
