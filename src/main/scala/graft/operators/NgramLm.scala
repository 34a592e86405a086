package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** Statistical n-gram language-model scoring — the CCNet-style perplexity
  * quality gate: train a smoothed word-bigram model on a reference slice of
  * the corpus, score every document by its mean negative log-likelihood
  * under that model, and let the caller keep the head of the distribution
  * (low nll = fluent, in-domain text; high nll = boilerplate, gibberish,
  * wrong-language residue the cheaper heuristics missed).
  *
  * Reference behavior: the quality-scoring surface of the reference's
  * document pipeline (see monarchmoney/lib.py transaction text normalize +
  * scoring shapes); the LM itself follows the public CCNet recipe
  * (Wenzek et al., 2020) with add-alpha smoothing in place of the paper's
  * Kneser-Ney — the filtering semantics (rank by per-token nll) are the
  * same, and add-alpha keeps every probability a rational function of
  * integer counts, auditable in plain SQL.
  *
  * Scale design:
  *   - ONE tokenization pass; bigrams are built row-local by an index-range
  *     `transform` slicing the same token array (the [[TfIdf
  *     .bigramVocabulary]] recipe — the array lives in its own projection
  *     because HOF lambdas defeat CSE).
  *   - The model tables are VOCABULARY-sized, not corpus-sized: ONE
  *     corpus-scale aggregate builds the bigram counts (keyed (w1, w2),
  *     map-side combined); context counts and the vocabulary size are
  *     second-level aggregates OF that table — the corpus is never
  *     re-scanned for them. Total corpus passes: one to train, one to
  *     score. At demo scale AQE broadcasts the model tables back onto the
  *     scoring stream; at web scale (billions of bigram types) the same
  *     plan degrades gracefully to shuffled joins on the model keys — no
  *     driver-side model object either way.
  *   - The vocabulary size V (smoothing denominator) rides along as a
  *     broadcast one-row cross join — no driver round-trip, one plan.
  *   - `ln` is the single libm call; engine parity is by rounding the final
  *     per-document mean to 4 decimals (the t08 stance), every other number
  *     is exact integer arithmetic.
  */
object NgramLm {

  /** Score every document's mean negative log-likelihood (nats per bigram)
    * under an add-`alpha` word-bigram model trained on the `trainFilter`
    * slice. p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V) with V =
    * distinct successor tokens in the train slice; an unseen context scores
    * the uniform 1/V. Documents with fewer than two tokens have no bigrams
    * and are absent from the output (they carry no LM evidence — gate them
    * with the length heuristics instead).
    *
    * Output: (id, n_bigrams, n_unseen, nll_per_tok) — `n_unseen` counts
    * bigrams absent from the train slice (an exact-integer OOV signal that
    * needs no rounding), `nll_per_tok` is round(mean nll, 4); perplexity =
    * e^nll_per_tok when a caller wants the classical units. */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      trainFilter: Column, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val toks = col("_toks")
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bigrams = docs
      .select(col(idCol), trainFilter.as("_train"),
        tokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), col("_train"), explode(pairs).as("_p"))
      .select(col(idCol), col("_train"),
        col("_p.w1").as("w1"), col("_p.w2").as("w2"))
    val bigramCounts = bigrams.filter(col("_train"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("_cb"))
    // vocabulary-sized second-level aggregates — no corpus re-scan
    val contextCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("_cb")).as("_cu"))
    val vocab = bigramCounts.agg(count_distinct(col("w2")).as("_v"))
    val nll = -log(
      (coalesce(col("_cb"), lit(0L)) + lit(alpha)) /
        (coalesce(col("_cu"), lit(0L)) + lit(alpha) * col("_v")))
    bigrams
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(contextCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("_cb").isNull, 1L).otherwise(0L)).as("n_unseen"),
        round(sum(nll) / count(lit(1)), 4).as("nll_per_tok"))
  }
}
