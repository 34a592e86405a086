package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Functions._

/** TF-IDF keyword extraction — per-document top-k distinguishing terms, the
  * workhorse behind corpus topic audits, near-duplicate triage, and cheap
  * retrieval indexes over training data.
  *
  * The score is the rational form `tf * (N / df)` = `cnt * N / n_tokens / df`
  * — a product/quotient of exact integers in one fixed evaluation order, so
  * the doubles are bit-identical on any engine with NO rounding (a log-based
  * idf would hostage parity to each engine's libm). Monotonic in the
  * classical `tf * log(N/df)` for fixed tf, and the per-document ranking is
  * what matters here.
  *
  * Scale design: two shuffles total — term counts keyed on (doc, term) with
  * map-side combine, and document frequency keyed on the term (its result is
  * dim-sized: the vocabulary, not the corpus) broadcast back. The corpus
  * row count rides along as a broadcast one-row cross join (no driver
  * round-trip, stays one plan). Top-k per doc uses the bounded-heap
  * `top_k_by` aggregate — k rows per (doc, partition) cross the final
  * shuffle, never a full per-doc sort.
  */
object TfIdf {

  /** Global corpus vocabulary — the tokenizer-training / coverage-audit
    * input: the `topV` terms by document frequency with their corpus-wide
    * occurrence totals. Output: (term, doc_freq, term_freq) ordered by
    * doc_freq DESC, term ASC (a total order — ranks are unambiguous).
    *
    * Scale design: the fused [[graft.Functions.term_counts]] kernel emits
    * PRE-COUNTED (term, cnt) per doc — no token-occurrence row ever exists —
    * so the only shuffle is the vocabulary-keyed aggregate (map-side
    * combined, vocabulary-sized not corpus-sized), and the top-V cut is a
    * TakeOrdered (k rows per partition cross to the driver-side merge,
    * never a global sort). */
  def vocabulary(docs: DataFrame, textCol: String, topV: Int,
                 minTokenLen: Int = 3, minDf: Long = 1): DataFrame = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    docs.select(term_counts(col(textCol), minTokenLen).as("_tc"))
      .select(explode(col("_tc.terms")).as("_t"))
      .select(col("_t.term").as("term"), col("_t.cnt").cast("long").as("cnt"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("cnt")).as("term_freq"))
      .filter(col("doc_freq") >= minDf)
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(topV)
  }

  /** Top-k terms per document by TF-IDF. Output: (id, rank, term, n, score)
    * with rank 1-based by (score DESC, term ASC). Tokens are lowercased;
    * `minTokenLen` drops punctuation-ish short tokens from the vocabulary.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5, minTokenLen: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // one fused kernel pass per doc: tokenize + filter + count duplicates.
    // Terms come out PRE-COUNTED (one row per distinct term per doc), so no
    // token-occurrence rows ever exist in the plan — the map-side combine
    // happens inside the scan projection. Materialized once because the
    // counts feed BOTH the scoring leg and the broadcast doc-frequency
    // build side (localCheckpoint stores on executors, memory-and-disk).
    val termCounts = docs
      .select(col(idCol), term_counts(col(textCol), minTokenLen).as("_tc"))
      .select(col(idCol), col("_tc.n_tokens").as("n_tokens"),
        explode(col("_tc.terms")).as("_t"))
      .select(col(idCol), col("n_tokens"),
        col("_t.term").as("term"), col("_t.cnt").cast("long").as("cnt"))
      .localCheckpoint(false)
    val docFreq = termCounts
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumnRenamed("term", "_df_term")
    val nDocs = docs.agg(count(lit(1)).as("_n_docs"))
    val scored = termCounts
      .join(broadcast(docFreq), col("term") === col("_df_term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("cnt").cast("double") * col("_n_docs") / col("n_tokens") / col("df"))
      .select(col(idCol), col("term"), col("cnt"), col("score"))
    Windows.topKPerGroup(
        scored.withColumn("_payload",
          struct(col("term"), col("cnt"), col("score"))),
        Seq(idCol), "_payload", "score", "term", k)
      .select(col(idCol), col("rank"),
        col("_payload.term").as("term"),
        col("_payload.cnt").as("n"),
        col("_payload.score").as("score"))
  }
}
