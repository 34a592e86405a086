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

  /** Train/eval split LEAKAGE detector — the companion check to
    * [[contamination]], run over the corpus's OWN splits: a document whose
    * exact or near duplicate landed in a different split leaks eval
    * content into training, and no benchmark list catches it. Exact pairs
    * come from one equi-join on the content hash (hot identical-content
    * groups capped like LSH buckets — a million blank documents must not
    * go quadratic); near pairs from the [[Dedup.minhashLsh]] banding
    * pipeline (capped buckets, never all-pairs). Both join the
    * deterministic id-hash split assignment ([[Sampling.assignSplit]] —
    * membership is a pure function of the id, so the report is stable
    * under reprocessing) and keep cross-split pairs only; exact pairs are
    * excluded from `near` so each leak reports once with its strongest
    * evidence. Output: (kind, id_a, id_b, split_a, split_b, jaccard). */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   weights: Seq[(String, Double)],
                   k: Int = 5, bands: Int = 4, rowsPerBand: Int = 4,
                   threshold: Double = 0.5, maxBucketSize: Int = 1000): DataFrame =
    splitLeakageFromPairs(docs, idCol, textCol, weights,
      Dedup.minhashLsh(docs, idCol, textCol, k, bands, rowsPerBand,
        threshold, maxBucketSize).select("id_a", "id_b", "jaccard"),
      maxBucketSize)

  /** [[splitLeakage]] over a PRECOMPUTED near-dup pair graph (id_a,
    * id_b, jaccard) — the stored-artifact shape: a maintained corpus
    * pair graph serves the leakage report (and clustering, and the
    * near-dup listing) without re-shingling the corpus per consumer.
    * The exact-dup half is one content-hash equi-join either way. */
  def splitLeakageFromPairs(docs: DataFrame, idCol: String, textCol: String,
                            weights: Seq[(String, Double)],
                            nearPairs: DataFrame,
                            maxBucketSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // staged once: the split table feeds FOUR join sides (id_a/id_b of
    // both the exact and near legs), each of which otherwise re-scans the
    // corpus and re-runs the assignment kernel (guide §5 — reuse beats
    // recompute for a doc-count × 2-column frame)
    val splits = Sampling.assignSplit(docs, idCol, weights)
      .select(col(idCol).as("_sid"), col("split"))
      .localCheckpoint(false)
    def attach(pairs: DataFrame): DataFrame = pairs
      .join(splits.select(col("_sid").as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col("_sid").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
    // staged once: both sides of the exact self-join read this frame, and
    // while ReuseExchange dedups the hash(_h) exchange, the Sort + Window
    // bucket-cap tower above it would run per leg (the smallStar lesson)
    val hashed = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("_h"))
      .withColumn("_sz", count(lit(1)).over(Window.partitionBy(col("_h"))))
      .filter(col("_sz") <= maxBucketSize).drop("_sz")
      .localCheckpoint(false)
    val exact = attach(
      hashed.select(col("_h"), col(idCol).as("id_a"))
        .join(hashed.select(col("_h"), col(idCol).as("id_b")), "_h")
        .filter(col("id_a") < col("id_b"))
        .drop("_h"))
      .withColumn("kind", lit("exact"))
      .withColumn("jaccard", lit(1.0))
      .localCheckpoint(false) // feeds the output AND the near anti-join
    val near = attach(nearPairs.select("id_a", "id_b", "jaccard"))
      .join(exact.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
      .withColumn("kind", lit("near"))
    val cols = Seq("kind", "id_a", "id_b", "split_a", "split_b", "jaccard")
    exact.select(cols.map(col): _*).unionByName(near.select(cols.map(col): _*))
  }
}
