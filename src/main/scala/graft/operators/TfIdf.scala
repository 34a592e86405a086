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

  /** Adjacent-token-pair (bigram) vocabulary — collocation mining and the
    * merge-candidate statistics a BPE-style tokenizer-training step consumes
    * (the most frequent adjacent pair is the next merge): the `topV` bigrams
    * by document frequency with corpus totals. Output: (bigram, doc_freq,
    * pair_freq) ordered by (doc_freq DESC, bigram ASC) — a total order.
    *
    * Scale design (the [[vocabulary]] recipe one order up): pairs are built
    * row-local from one tokenization pass (an index-range transform slicing
    * the same token array — no re-tokenization), ONE scan emits
    * (id, bigram) rows, the only shuffle is the bigram-keyed aggregate
    * (map-side combined, vocabulary-sized, doc_freq via the distinct-id
    * rewrite), and the top-V cut is a TakeOrdered. */
  def bigramVocabulary(docs: DataFrame, idCol: String, textCol: String,
                       topV: Int, minDf: Long = 1): DataFrame = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    // tokenize in its OWN projection: the bigram lambda reads the array 4x
    // (two sizes, two element_ats per element), and HOF lambdas defeat
    // common-subexpression elimination — inlined, the split() would re-run
    // per element_at, turning an O(tokens) row into O(tokens^2).
    // CollapseProject keeps a non-cheap multi-use alias materialized.
    val toks = col("_toks")
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), tokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), explode(pairs).as("bigram"))
      .groupBy(col("bigram"))
      .agg(countDistinct(col(idCol)).as("doc_freq"),
        count(lit(1)).as("pair_freq"))
      .filter(col("doc_freq") >= minDf)
      .orderBy(col("doc_freq").desc, col("bigram"))
      .limit(topV)
  }

  /** BM25 keyword retrieval — score every document against a small literal
    * query-term list and return the top-k, the lexical-search complement to
    * the ANN entry points ([[graft.operators.Similarity]]): hybrid corpus
    * search, eval-set mining, targeted corpus audits.
    *
    * score(d) = sum over query terms t of
    *   idf_r(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    * with the RATIONAL idf (N - df + 0.5)/(df + 0.5) — the classical
    * log-idf's argument, monotone in it per term, and free of libm (the
    * same engine-exactness stance as [[topTerms]]). All doubles come from
    * one fixed expression tree (per-term scores summed in query order, no
    * aggregate over terms), so any engine reproduces the ranking bit for
    * bit.
    *
    * CAVEAT — multi-term rankings deviate from classical BM25: per term
    * the rational idf is a monotone transform of log-idf, so SINGLE-term
    * rankings match exactly, but summing unlogged idfs across terms
    * amplifies rare-term weight relative to summing their logs (a doc
    * matching one rare term can outrank a doc matching several common
    * ones where log-BM25 would order them oppositely). This is the
    * documented trade for an engine-exact, libm-free score; callers
    * needing classical multi-term BM25 semantics should apply a log on
    * the idf leg and accept engine-specific last-ulp ranking ties.
    *
    * Scale design: ONE corpus scan — tf per query term is a row-local
    * lookup into the fused [[graft.Functions.term_counts]] kernel's
    * pre-counted output (no token explode, no per-term shuffle); the corpus
    * stats (N, sum dl, per-term df) are one global aggregate broadcast back
    * as a single row; the top-k cut is a TakeOrdered. Query terms are a
    * literal list (searches are a handful of terms), never a data-scale
    * side. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75,
                 minTokenLen: Int = 3): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search: queryTerms must be non-empty")
    require(k >= 1, s"bm25Search: k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase)
    // one kernel pass: dl (kept-token count) + tf per query term, row-local
    val base = docs
      .select(col(idCol), term_counts(col(textCol), minTokenLen).as("_tc"))
      .select(col(idCol) +: col("_tc.n_tokens").as("_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          coalesce(
            try_element_at(filter(col("_tc.terms"),
              x => x.getField("term") === lit(t)), lit(1)).getField("cnt"),
            lit(0)).as(s"_tf$i")
        }: _*)
      .localCheckpoint(false) // feeds the stats aggregate AND the scoring leg
    val aggCols = Seq(count(lit(1)).as("_n"), sum(col("_dl").cast("long")).as("_sumdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val df = col(s"_df$i").cast("double")
      val idf = (col("_n").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      val num = tf * (lit(k1) + lit(1.0))
      val den = tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl").cast("double") / avgdl)
      when(col(s"_tf$i") > 0, idf * num / den).otherwise(lit(0.0))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
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

  /** Inverted-index posting lists for a selected vocabulary slice — the
    * retrieval artifact behind BM25/keyword search over a corpus: per term,
    * the doc_id-ordered "doc:tf" postings string plus corpus stats.
    *
    * Scale design — selection BEFORE materialization: document frequencies
    * are aggregated first (vocabulary-sized), the df-band [minDf, maxDf]
    * and top-V cut pick the term slice, and only then are postings built,
    * via a BROADCAST semi-join of the (bounded) selection against the
    * counts. A stopword's corpus-scale posting list is therefore never
    * collected anywhere — the classic inverted-index skew (the "the" list)
    * is excluded by maxDf before any per-term list exists. Postings order
    * by doc_id inside each list (array_sort on a doc-unique struct), so
    * the string is engine-deterministic. */
  def postingLists(docs: DataFrame, idCol: String, textCol: String,
                   topV: Int, minTokenLen: Int = 3,
                   minDf: Long = 2, maxDf: Long = Long.MaxValue): DataFrame = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    require(minDf <= maxDf, s"need minDf <= maxDf, got [$minDf, $maxDf]")
    val counts = docs
      .select(col(idCol).as("doc_id"), term_counts(col(textCol), minTokenLen).as("_tc"))
      .select(col("doc_id"), explode(col("_tc.terms")).as("_t"))
      .select(col("doc_id"), col("_t.term").as("term"),
        col("_t.cnt").cast("long").as("cnt"))
      .localCheckpoint(false) // feeds the df agg AND the postings build
    val selected = counts
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("cnt")).as("term_freq"))
      .filter(col("doc_freq").between(minDf, maxDf))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(topV)
    counts
      .join(broadcast(selected), "term")
      .groupBy(col("term"), col("doc_freq"), col("term_freq"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("doc_id"), col("cnt")))),
          x => concat(x("doc_id").cast("string"), lit(":"),
            x("cnt").cast("string")))).as("postings"))
      .orderBy(col("doc_freq").desc, col("term"))
  }
}
