package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Functions._

/** Benchmark decontamination — the training-data hygiene check that flags
  * corpus documents sharing word n-grams with an evaluation/benchmark set
  * (the standard guard against test-set leakage into training data).
  *
  * Scale design: the benchmark side is TINY relative to the corpus (eval
  * suites are megabytes; the corpus is the 100 TB side), so its distinct
  * gram set is broadcast — the corpus-side gram explosion joins against it
  * with NO shuffle of corpus data beyond the per-doc re-aggregation, which
  * is keyed on the doc id and map-side combined. Grams are 48-bit md5
  * hashes (the fused `ngram_hash_set` kernel — one codegen pass per doc,
  * no gram-string materialization), so the broadcast is 8 bytes per
  * benchmark gram and the overlap check is a long equi-join.
  */
object Decontaminate {

  /** Per-document contamination report: distinct n-gram count, how many of
    * those grams appear anywhere in `bench`, their ratio, and a 0/1 flag at
    * `threshold`. Documents with no text still report (their single partial
    * gram follows the kernel's shingle convention).
    *
    * The ratio is one IEEE double division of two integers — deterministic
    * on any engine, no rounding needed.
    */
  def contamination(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = bench
      .select(explode(ngram_hash_set(col(textCol), n)).as("_gram"))
      .distinct()
      .withColumn("_hit", lit(1))
    corpus
      .select(col(idCol), ngram_hash_set(col(textCol), n).as("_gset"))
      .withColumn("n_grams", size(col("_gset")))
      .select(col(idCol), col("n_grams"), explode(col("_gset")).as("_gram"))
      .join(broadcast(benchGrams), Seq("_gram"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(col("_hit")).as("n_matched"))
      .withColumn("overlap_ratio",
        col("n_matched").cast("double") / col("n_grams"))
      .withColumn("contaminated",
        when(col("overlap_ratio") >= threshold, 1).otherwise(0))
  }
}
