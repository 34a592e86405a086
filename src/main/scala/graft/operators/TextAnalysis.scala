package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-hit heuristic), quality scoring, token statistics, document
  * fingerprinting. All row-local single-pass expressions (whole-stage
  * codegen, no shuffle) — at 100 TB these run at scan speed.
  *
  * Regex usage is restricted to literal character classes and `\s+` so the
  * semantics are identical across regex engines (oracle parity).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (top function words) — the single
    * source of truth, shared with the fused lang_id kernel
    * (LangIdUtil builds its hash sets from this map at class init). */
  val stopwords: Map[String, Seq[String]] = graft.functions.LangIdUtil.stopwords

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID heuristic: lowercase-token stopword hits per language;
    * winner by (hits desc, language name asc); 'und' (undetermined) when no
    * list matches at all. Fused single-pass kernel (LangIdUtil) — the
    * interpreted HOF formulation it replaced lives on as the equivalence
    * spec in TextAnalysisSpec. */
  def langId(text: Column): Column = lang_id(text)

  /** Quality signals: char/token counts, punctuation ratio, stopword ratio,
    * mean token length, and a composite keep/drop score in [0,1]. One fused
    * kernel pass (functions.QualityUtil) — the HOF composition it replaced
    * tokenized three times with interpreted lambdas; it lives on as
    * [[qualitySignalsHof]], the equivalence oracle in TextAnalysisSpec. */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val outNames = Set("n_chars", "n_tokens", "punct_ratio", "stopword_ratio",
      "mean_token_len", "quality_score")
    // input columns colliding with an output name are replaced, matching the
    // withColumn semantics of the HOF formulation
    val cols = df.columns.filterNot(outNames).map(col)
    df.withColumn("_q", quality_signals(col(textCol)))
      .select(cols :+ col("_q.n_chars").as("n_chars") :+
        col("_q.n_tokens").as("n_tokens") :+
        col("_q.punct_ratio").as("punct_ratio") :+
        col("_q.stopword_ratio").as("stopword_ratio") :+
        col("_q.mean_token_len").as("mean_token_len") :+
        col("_q.quality_score").as("quality_score"): _*)
  }

  /** The original declarative formulation — retained as the spec's oracle
    * for the fused kernel (not on any hot path). */
  def qualitySignalsHof(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val stopHits = hits(tokens(lower(text)), stopwords("en"))
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nToks)
      .withColumn("punct_ratio", round(punct.cast("double") / greatest(nChars, lit(1)), 6))
      .withColumn("stopword_ratio", round(stopHits.cast("double") / greatest(nToks, lit(1)), 6))
      .withColumn("mean_token_len",
        round(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
          greatest(nToks, lit(1)), 6))
      .withColumn("quality_score", round(
        when(nToks >= 10 && nToks <= 100000, 0.4).otherwise(0.0) +
        when(col("punct_ratio") <= 0.1, 0.3).otherwise(0.0) +
        when(col("mean_token_len").between(2.0, 12.0), 0.3).otherwise(0.0), 2))
  }

  /** BPE-ish pre-tokenizer chunking (the GPT-2 shape, ASCII form): letter
    * runs, digit runs, and punctuation runs, each with an optional leading
    * space. Same RE2/Java-compatible pattern runs in the DuckDB oracle. */
  val subwordPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** Token statistics: whitespace counts, distinct counts, type-token
    * ratio, and the BPE-ish subword chunk count. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("type_token_ratio",
        round(size(array_distinct(toks)).cast("double") /
          greatest(size(toks), lit(1)), 6))
      .withColumn("n_subword_chunks",
        size(regexp_extract_all(col(textCol), lit(subwordPattern), lit(0))))
  }

  /** Hashed-n-gram linear classifier scoring — the fastText-style quality /
    * domain classifier a pretraining pipeline applies to every document
    * (CCNet's quality model, the "looks like reference text" filters):
    * word bigrams hash into `numBuckets` feature buckets, each bucket
    * carries a fixed weight, and a document's score is the sum of its
    * bigram-bucket weights. Weights here are DERIVED deterministically
    * from the bucket id (`(bucket * 2654435761) mod 1001 - 500`, a
    * Knuth-multiplicative spread into [-500, 500]) — the plumbing is
    * exactly a trained model's (hash → bucket → weight → sum); a real
    * deployment broadcasts a learned weight array instead of computing
    * the weight inline, with no change of plan shape.
    *
    * Scale design: ZERO shuffle — tokenize, bigram, hash, and the
    * weight-sum all fuse into one row-local projection (the score is an
    * `aggregate` HOF over the bigram array, not an exploded groupBy: no
    * per-gram row ever exists). Integer weights keep the sum exact, so
    * the score and the keep/drop verdict are engine-identical — the
    * md5-bucket contract every hash-derived operator here shares.
    * Tokenization is its own projection (HOF lambdas defeat CSE — the
    * [[TfIdf.bigramVocabulary]] posture). */
  def hashedClassifierScore(df: DataFrame, idCol: String, textCol: String,
                            numBuckets: Int = 4096): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val toks = col("_toks")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    def weight(g: Column): Column = {
      val bucket = conv(substring(md5(g), 1, 4), 16, 10).cast("long") % numBuckets
      (bucket * lit(2654435761L)) % 1001L - 500L
    }
    df.select(col(idCol), tokens(lower(col(textCol))).as("_toks"))
      .select(col(idCol), bigrams.as("_bg"))
      .select(col(idCol),
        size(col("_bg")).as("n_bigrams"),
        coalesce(aggregate(col("_bg"), lit(0L), (acc, g) => acc + weight(g)),
          lit(0L)).as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text, plus
    * a 48-bit integer form for cheap joins/bucketing. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    df.withColumn("fingerprint", md5(norm))
      .withColumn("fingerprint_int", md5_prefix_long(norm))
  }

  /** Fixed-size overlapping token-window chunking (LLM context packing):
    * chunk i covers tokens [i*stride, i*stride + chunkTokens) with
    * stride = chunkTokens - overlap; the last chunk may be short; a document
    * shorter than one chunk yields exactly one chunk. Row-local explode of a
    * bounded index range — no shuffle, and the token array is built once per
    * row (chunks slice it, they do not re-tokenize). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / stride), lit(1.0)).cast("int")
    df.select(col(idCol), toks.as("_toks"),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(
        col(idCol),
        col("pos").as("chunk_no"),
        (col("pos") * stride).as("start_token"),
        size(slice(col("_toks"), col("pos") * stride + 1, lit(chunkTokens))).as("n_tokens"),
        array_join(slice(col("_toks"), col("pos") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Repetition signals (the Gopher-style within-document quality rules):
    * fraction of duplicate word n-grams — boilerplate and degenerate
    * generations repeat heavily while natural text does not. Row-local:
    * n-grams are joined token slices over one tokenization pass; ratio =
    * 1 - distinct/total (0.0 for docs shorter than n). */
  def repetitionSignals(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val total = greatest(size(tokens(col(textCol))) - lit(n - 1), lit(0))
    // distinct count via the fused 48-bit n-gram hash kernel — one codegen
    // pass, no gram-array materialization (a transform+slice formulation
    // was 10x slower at bench scale). 48-bit collisions are negligible and
    // the oracle mirrors the same hashes. The kernel emits one partial gram
    // for docs shorter than n (shingle convention); the total==0 guard
    // masks it so short docs read 0/0.
    val distinctGrams = when(total === lit(0), 0)
      .otherwise(size(ngram_hash_set(col(textCol), n)))
    // ratio left unrounded: 1.0 - d/t is two sequential IEEE ops, identical
    // in any engine, while rounding could tie at the kept digit
    df.withColumn("n_ngrams", total)
      .withColumn("n_distinct_ngrams", distinctGrams)
      .withColumn("dup_ngram_ratio",
        when(col("n_ngrams") === 0, 0.0) // no grams = no repetition, not "all duplicate"
          .otherwise(lit(1.0) - col("n_distinct_ngrams").cast("double") / col("n_ngrams")))
  }

  /** URL shape restricted to constructs with identical semantics in Java
    * regex and RE2: scheme + host charset run (no backtracking-order
    * dependence). */
  val urlPattern: String = "https?://[A-Za-z0-9.-]+"

  /** URL/domain filtering (the Common-Crawl-style source gate): extract
    * URLs, derive the distinct sorted domain set, and flag documents whose
    * domains hit a blocklist. Row-local regex + array ops at scan speed;
    * the blocklist is a constant (in production a broadcast dim — eval the
    * same way via isInCollection on the exploded form if it outgrows a
    * literal). */
  def urlFilter(df: DataFrame, textCol: String, blocklist: Seq[String]): DataFrame = {
    val urls = regexp_extract_all(col(textCol), lit(urlPattern), lit(0))
    val domains = array_sort(array_distinct(
      transform(urls, u => regexp_replace(u, "^https?://", ""))))
    df.withColumn("n_urls", size(urls))
      .withColumn("domains_csv", array_join(domains, ","))
      .withColumn("blocked",
        when(exists(domains, d => d.isInCollection(blocklist)), 1).otherwise(0))
  }

  /** Cross-document boilerplate removal (the CCNet / RefinedWeb line-dedup
    * shape): split every document into fixed units, drop units that appear
    * in at least `minDocs` DISTINCT documents (headers, footers, cookie
    * banners, licence blocks), reassemble the survivors in original order.
    * The unit here is a `segmentTokens`-token window (the synthetic corpus
    * is newline-free); on real web text the same operator runs with lines
    * as units — only the split expression changes.
    *
    * Scale design — the text never crosses a shuffle: the first scan emits
    * only (id, seg_no, md5(segment)) rows; unit doc-frequency is one
    * hash-keyed aggregate (map-side combined, 16-byte keys); the per-doc
    * keep list folds back to one array row per doc; and reassembly re-reads
    * the original row and re-slices its token array by the kept indices —
    * one extra doc-keyed join instead of shipping every segment's text
    * through the frequency shuffle. Output one row per input document:
    * (id, n_segments, n_removed, clean_md5) where clean_md5 hashes the
    * whitespace-normalized surviving text (single-space joined — the same
    * normalization the tokenizer applies).
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        segmentTokens: Int = 20, minDocs: Int = 2): DataFrame = {
    require(segmentTokens > 0, s"segmentTokens must be positive, got $segmentTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = tokens(col(textCol))
    // staged ONCE: the tokenization otherwise runs twice — under the
    // segment-hash explode and again for the reassembly leg (the
    // [[removeBoilerplateLines]] trade, guide §5)
    val staged = df.select(col(idCol), toks.as("_toks"))
      .localCheckpoint(false)
    // narrow segment stream: id, seg_no, 128-bit unit hash — no text
    val nSegsT = greatest(
      ceil(size(col("_toks")).cast("double") / segmentTokens), lit(1.0)).cast("int")
    val hashes = staged
      .select(col(idCol), col("_toks"), posexplode(sequence(lit(0), nSegsT - 1)))
      .select(col(idCol), col("pos").as("_seg_no"),
        md5(array_join(slice(col("_toks"), col("pos") * segmentTokens + 1,
          lit(segmentTokens)), " ")).as("_h"))
    val docFreq = hashes.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_df"))
    val perDoc = hashes.join(docFreq, "_h")
      .withColumn("_boiler", col("_df") >= minDocs)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_segments"),
        sum(when(col("_boiler"), 1).otherwise(0)).cast("int").as("n_removed"),
        array_sort(collect_list(when(!col("_boiler"), col("_seg_no"))))
          .as("_kept"))
    staged
      .join(perDoc, idCol)
      .select(col(idCol), col("n_segments"), col("n_removed"),
        md5(array_join(flatten(transform(col("_kept"),
          i => slice(col("_toks"), i * segmentTokens + 1, lit(segmentTokens)))), " "))
          .as("clean_md5"))
  }

  /** [[removeBoilerplate]] with LINES as the unit — the literal CCNet /
    * RefinedWeb form for newline-bearing web text: a trimmed non-empty
    * line appearing in at least `minDocs` DISTINCT documents (headers,
    * footers, cookie banners) is dropped everywhere; survivors reassemble
    * in original order, newline-joined. Same scale shape as the
    * token-window form: the frequency shuffle carries only (id, line_no,
    * md5) — text never leaves its scan partition — and reassembly
    * re-slices the original row's line array by the kept indices. Output
    * one row per doc: (id, n_lines, n_removed, clean_md5) where clean_md5
    * hashes the newline-joined surviving lines. */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lineArr = filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    // staged ONCE: the line-array derivation (and, for derived corpora, the
    // whole upstream text synthesis) otherwise runs twice — once under the
    // hash explode and again for the reassembly leg; same materialize-the-
    // shared-input trade as minhashLsh's shingle sets (guide §5)
    val staged = df.select(col(idCol), lineArr.as("_lines"))
      .localCheckpoint(false)
    val hashes = staged
      .select(col(idCol), posexplode(col("_lines")))
      .select(col(idCol), col("pos").as("_line_no"), md5(col("col")).as("_h"))
    val docFreq = hashes.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_df"))
    val perDoc = hashes.join(docFreq, "_h")
      .withColumn("_boiler", col("_df") >= minDocs)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_lines"),
        sum(when(col("_boiler"), 1).otherwise(0)).cast("int").as("n_removed"),
        array_sort(collect_list(when(!col("_boiler"), col("_line_no"))))
          .as("_kept"))
    staged
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0)).as("n_lines"),
        coalesce(col("n_removed"), lit(0)).as("n_removed"),
        md5(coalesce(array_join(transform(col("_kept"),
          i => element_at(col("_lines"), i.cast("int") + 1)), "\n"), lit("")))
          .as("clean_md5"))
  }

  /** Gopher duplicate-LINE fractions (Rae et al. 2021 §A1.1, the literal
    * line-unit form — [[gopherRepetition]] is the token-window analog for
    * newline-free corpora): per doc, the fraction of lines occurring more
    * than once in the SAME document (every occurrence counted) and the
    * fraction of line characters inside those duplicates. Lines are
    * trimmed; empty lines are ignored.
    *
    * Scale design: entirely row-local — the trimmed line array sorts
    * IN-ROW (staged as a real column, the t41 lesson: inlined HOF arrays
    * re-evaluate per element) and ONE linear fold over the sorted array
    * detects equal runs, so the gate runs at scan speed with zero
    * shuffle. */
  def gopherLineRepetition(df: DataFrame, textCol: String): DataFrame = {
    val staged = df.withColumn("_lines", array_sort(
      filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => length(l) > 0)))
    // fold state: (prev line, current run length, current run chars,
    // duplicate-line count so far, duplicate chars so far); a run of
    // length >= 2 contributes ALL its occurrences and characters
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("rchars"),
      lit(0L).as("dups"), lit(0L).as("dchars"))
    def flushed(acc: Column) = struct(
      when(acc.getField("run") >= 2, acc.getField("dups") + acc.getField("run"))
        .otherwise(acc.getField("dups")).as("dups"),
      when(acc.getField("run") >= 2, acc.getField("dchars") + acc.getField("rchars"))
        .otherwise(acc.getField("dchars")).as("dchars"))
    val folded = aggregate(col("_lines"), zero,
      (acc, x) => {
        val same = x === acc.getField("prev") && acc.getField("run") >= 1
        val f = flushed(acc)
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("rchars") + length(x)).otherwise(length(x).cast("long"))
            .as("rchars"),
          when(same, acc.getField("dups")).otherwise(f.getField("dups")).as("dups"),
          when(same, acc.getField("dchars")).otherwise(f.getField("dchars")).as("dchars"))
      },
      acc => flushed(acc))
    staged
      .withColumn("_f", folded)
      // staged as a column for the same reason _f is: referenced twice
      // below (guard + divisor), and an inlined interpreted aggregate
      // would re-run its O(n) fold per reference
      .withColumn("_tot",
        aggregate(col("_lines"), lit(0L), (a, x) => a + length(x)))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_dup_lines", col("_f.dups"))
      .withColumn("dup_line_frac",
        when(col("n_lines") === 0, 0.0)
          .otherwise(col("n_dup_lines").cast("double") / col("n_lines")))
      .withColumn("dup_line_char_frac",
        when(col("_tot") === 0, 0.0)
          .otherwise(col("_f.dchars").cast("double") / col("_tot")))
      .drop("_lines", "_f", "_tot")
  }

  /** PII patterns kept to constructs with identical semantics in Java regex
    * and RE2 (no backtracking-order dependence): a literal email shape and
    * plain 7+-digit runs. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val digitRunPattern: String = "[0-9]{7,}"

  /** PII redaction: emails then long digit runs (phone/account numbers)
    * replaced by typed sentinels, with per-category match counts kept for
    * corpus audit. Order matters — emails can contain digit runs, so they
    * are counted and replaced first. Row-local, runs at scan speed. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    df.withColumn("n_emails", size(regexp_extract_all(text, lit(emailPattern), lit(0))))
      .withColumn("n_digit_runs", size(regexp_extract_all(noEmail, lit(digitRunPattern), lit(0))))
      .withColumn("redacted", regexp_replace(noEmail, digitRunPattern, "<NUMBER>"))
  }

  /** Canonical form of an http(s) URL (the CCNet/Dolma URL-dedup key —
    * crawls see the same page under case-shuffled hosts, default ports,
    * tracking params, fragments and trailing slashes, and deduplicate on
    * the canonical form, not the raw string). Normalizations applied, each
    * an RFC 3986 §6 equivalence or the standard crawl-pipeline extension:
    *
    *  - fragment dropped (never sent to the server);
    *  - scheme and host case-folded;
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - leading `www.` stripped from the host;
    *  - empty path -> `/`; ONE trailing slash stripped from a non-root
    *    path (the generator never emits `//` runs — documented contract);
    *  - tracking query params dropped (`utm_*`, `ref=`), survivors sorted
    *    so param order cannot split a dedup group; empty query dropped.
    *
    * Pure string/array built-ins — row-local, whole-stage codegen, no
    * shuffle; regexes are anchors + literal character classes only, so
    * Java and RE2 (the oracle engine) agree. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_extract(noFrag, "^[^?]*", 0)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    val hostNoPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val rawPath = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      substr(path0, lit(1), length(path0) - 1)).otherwise(path0)
    // prefix tests instead of LIKE so the literal underscore in `utm_`
    // cannot act as a wildcard in the oracle's replay
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && substring(p, 1, 4) =!= "utm_" && substring(p, 1, 4) =!= "ref="))
    val canonQuery = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, canonQuery)
  }

  /** URL-keyed deduplication (keep-latest): group on the canonical URL,
    * keep the highest id as the surviving version, and report how many raw
    * variants the canonicalization collapsed. One map-side-combined
    * hash-shuffle on the canonical key — the countDistinct adds the
    * standard two-phase expand, both phases on the same key, so at 100 TB
    * this costs exactly one URL-keyed exchange. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.groupBy(canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(
        max(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_versions"),
        countDistinct(col(urlCol)).as("n_raw_variants"))

  /** Gopher-style repetition signals (after Rae et al. 2021 §A1.1's
    * duplicate-line family): within-document repetition marks boilerplate
    * and degenerate generations. The corpus is newline-free, so the
    * "line" unit is a non-overlapping `segTokens`-token window — the same
    * unit convention [[removeBoilerplate]] documents (the literal
    * line-unit form runs over a newline-bearing corpus in
    * [[gopherLineRepetition]]). Reported per doc:
    *
    *  - `n_segments`, `n_dup_segments`, `dup_segment_frac`: segments whose
    *    text occurs more than once in the SAME document (every occurrence
    *    counted, as Gopher does);
    *  - `dup_segment_char_frac`: characters inside those duplicate
    *    segments over all segment characters;
    *  - `n_bigrams`, `top_bigram_count`, `top_bigram_frac`: the mode
    *    multiplicity of the word 2-grams. NOTE: `top_bigram_frac` is an
    *    OCCURRENCE fraction (mode count / n_bigrams) — an auxiliary
    *    diagnostic, not the paper's gate;
    *  - `top_bigram_char_frac`: the paper's actual §A1.1 quantity —
    *    characters covered by occurrences of the most frequent 2-gram
    *    (count x gram length, ties to the lexicographically smallest
    *    gram) over the space-trimmed document length. Apply Gopher's
    *    0.20 threshold to THIS column.
    *
    * Scale design: entirely row-local — segments and bigrams are sorted
    * IN-ROW (`array_sort`) and duplicates read off adjacent equality, so
    * no per-line explode, no shuffle, and the doc text never leaves its
    * scan partition. Fractions are a single IEEE division over
    * order-independent integer sums, so any engine reproduces them
    * bit-for-bit. */
  def gopherRepetition(df: DataFrame, textCol: String, segTokens: Int = 2): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    val outNames = Seq("n_segments", "n_dup_segments", "dup_segment_frac",
      "dup_segment_char_frac", "n_bigrams", "top_bigram_count",
      "top_bigram_frac", "top_bigram_char_frac")
    val cols = df.columns.filterNot(outNames.toSet).map(col)
    df.withColumn("_g", gopher_repetition(col(textCol), segTokens))
      .select(cols ++ outNames.map(n => col(s"_g.$n").as(n)): _*)
  }

  /** The staged-HOF formulation — retained as the spec's equivalence
    * oracle for the fused kernel (not on any hot path). Staging the
    * sorted arrays as REAL columns matters even here: lambda bodies are
    * interpreted, and an outer expression referenced inside one
    * re-evaluates per ELEMENT — with the arrays inlined, every
    * element_at(segs, i) re-ran the whole tokenize+slice+sort chain,
    * turning a linear fold quadratic (measured: the inlined form hung the
    * sf0.1 bench). As attributes they cost one row-read per reference,
    * and CollapseProject keeps multi-referenced non-cheap aliases staged. */
  def gopherRepetitionHof(df: DataFrame, textCol: String, segTokens: Int = 2): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    val w = segTokens
    val toks0 = tokens(col(textCol))
    // tokens() never yields an empty array (split of "" is [""]), so nSeg
    // >= 1 and the 0-based index sequence below is always ascending
    val nSeg0 = ceil(size(toks0).cast("double") / w).cast("long")
    val staged = df
      .withColumn("_toks", toks0)
      .withColumn("_segs", array_sort(transform(sequence(lit(0L), nSeg0 - 1),
        i => array_join(slice(col("_toks"), (i * w + 1).cast("int"), lit(w)), " "))))
      .withColumn("_bg", array_sort(
        when(size(col("_toks")) >= 2, transform(sequence(lit(1), size(col("_toks")) - 1),
          i => concat_ws(" ", element_at(col("_toks"), i), element_at(col("_toks"), i + 1))))
          .otherwise(array().cast("array<string>"))))
    val segs = col("_segs")
    val nTok = size(col("_toks"))
    val nSeg = size(segs).cast("long")
    // a sorted element is part of a duplicate group iff it equals a
    // neighbor; CaseWhen keeps the out-of-range element_at unevaluated
    def dupAt(i: Column): Column =
      when(i > 1, element_at(segs, (i - 1).cast("int")) === element_at(segs, i.cast("int")))
        .otherwise(lit(false)) ||
      when(i < nSeg, element_at(segs, (i + 1).cast("int")) === element_at(segs, i.cast("int")))
        .otherwise(lit(false))
    val dupIdx = filter(sequence(lit(1L), nSeg), dupAt(_))
    val nDup = size(dupIdx).cast("long")
    val dupChars = aggregate(dupIdx, lit(0L),
      (acc, i) => acc + length(element_at(segs, i.cast("int"))).cast("long"))
    val totalChars = aggregate(segs, lit(0L), (acc, s) => acc + length(s).cast("long"))
    val nBigrams = greatest(nTok - 1, lit(0)).cast("long")
    // mode = longest equal run in the sorted gram array: one fold with a
    // (prev, run, best, bestg) accumulator. The STRICT improvement test
    // keeps the first run reaching the max, i.e. the lexicographically
    // smallest gram among count ties — the kernel's tie rule
    val topStruct = aggregate(col("_bg"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit("").as("bestg")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
        val better = run > acc.getField("best")
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("best")).as("best"),
          when(better, x).otherwise(acc.getField("bestg")).as("bestg"))
      },
      acc => struct(acc.getField("best").as("best"), acc.getField("bestg").as("bestg")))
    staged
      .withColumn("n_segments", nSeg)
      .withColumn("n_dup_segments", nDup)
      .withColumn("dup_segment_frac", nDup.cast("double") / col("n_segments"))
      .withColumn("dup_segment_char_frac",
        when(totalChars === 0, 0.0).otherwise(dupChars.cast("double") / totalChars))
      .withColumn("n_bigrams", nBigrams)
      .withColumn("_top", topStruct)
      .withColumn("top_bigram_count", col("_top.best"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(col("top_bigram_count").cast("double") / col("n_bigrams")))
      .withColumn("top_bigram_char_frac",
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(col("top_bigram_count").cast("double") *
            length(col("_top.bestg")) / length(trim(col(textCol)))))
      .drop("_toks", "_segs", "_bg", "_top")
  }
}
