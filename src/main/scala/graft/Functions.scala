package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.functions.{CosineSim, DotProduct, JaccardGe, JaccardSorted, L2Norm, LangId, MinhashFromHashes, MinhashSignature, ParseMoney, ShingleHashSet, SimHash}

/** Column-level function surface of the engine (SURVEY §2.8).
  *
  * Everything here is either a built-in `org.apache.spark.sql.functions`
  * composition (codegen'd for free) or a native Catalyst expression — no
  * Scala UDFs on any hot path.
  */
object Functions {

  /** F1 — currency scrub (`$`/`,` stripped, `(x)` -> `-x`, empty -> 0.0,
    * unparseable -> null). Native expression with codegen. */
  def parse_money(c: Column): Column =
    bridge.column(ParseMoney(bridge.expression(c)))

  /** The v3:526 scrub alone (no parse): shares MoneyUtil.clean with
    * parse_money so both see byte-identical cleaned strings. */
  def money_clean(c: Column): Column =
    bridge.column(graft.functions.MoneyClean(bridge.expression(c)))

  /** F1 keep-on-failure branch: the reference keeps the CLEANED string in
    * the cell when the parse fails (v3:532 `td[field] = cleaned_amount`);
    * in a monotyped column we quarantine that cleaned form in a sibling. */
  def money_quarantine(c: Column): Column =
    when(parse_money(c).isNull && c.isNotNull, money_clean(c))

  /** F3 — timestamp render `yyyy-MM-dd HH:mm:ss` (v3:393-403). */
  def format_timestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** F4 — Google-Sheets `=DATE(y,m,d)` serialization (v3:405-429); sink-layer.
    * Fast path for an already-typed date/timestamp column. */
  def sheets_date_formula(c: Column): Column =
    concat(lit("=DATE("), year(c), lit(","), month(c), lit(","), dayofmonth(c), lit(")"))

  /** F4 lenient path — `_format_date`'s multi-format fallback parse over a
    * raw STRING cell (v3:405-429): empty -> ""; contains 'T' -> full ISO
    * datetime validation, date taken from the leading date component AS
    * WRITTEN (fromisoformat keeps the original offset — no UTC shift);
    * else `%Y-%m-%d` (Python strptime tolerates unpadded month/day, hence
    * `yyyy-M-d`); else `%m/%d/%Y`; else the original string unchanged.
    *
    * Only ONE slash fallback: the reference's for-loop over five formats
    * sits inside a single try, so the first strptime mismatch raises out of
    * the loop (v3:421-427) — `%m/%d/%Y` is the only reachable fallback, and
    * we faithfully reproduce that. */
  def sheets_date_formula_lenient(c: Column): Column = {
    val isoTsValid = try_to_timestamp(regexp_replace(c, "Z$", "+00:00")).isNotNull
    val isoDatePart = to_date(try_to_timestamp(substring(c, 1, 10), lit("yyyy-MM-dd")))
    val plainDate = to_date(try_to_timestamp(c, lit("yyyy-M-d")))
    val usDate = to_date(try_to_timestamp(c, lit("M/d/yyyy")))
    when(c.isNull || c === "", lit(""))
      .when(c.contains("T"), coalesce(when(isoTsValid, sheets_date_formula(isoDatePart)), c))
      .otherwise(coalesce(
        sheets_date_formula(plainDate), sheets_date_formula(usDate), c))
  }

  /** A4 — tags array -> comma-separated-list of non-empty names (v3:482-499). */
  def tags_csl(tags: Column, nameField: String = "name"): Column =
    array_join(
      filter(transform(tags, t => t.getField(nameField)), n => n.isNotNull && n =!= ""),
      ", ")

  /** Fused one-pass MinHash signature (codegen'd kernel; bit-identical to the
    * interpreted HOF composition it replaced — see TextHashUtil). */
  def minhash_signature(text: Column, k: Int, numHashes: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(text), k, numHashes))

  /** Sorted distinct 48-bit shingle hashes — the Jaccard set representation. */
  def shingle_hash_set(text: Column, k: Int): Column =
    bridge.column(ShingleHashSet(bridge.expression(text), k))

  /** Sorted distinct 48-bit word-n-gram hashes (fused kernel). */
  def ngram_hash_set(text: Column, n: Int): Column =
    bridge.column(graft.functions.NgramHashSet(bridge.expression(text), n))

  /** Winnowing document fingerprints: O(n) Rabin-Karp rolling hash over
    * k-char windows, then sliding-window-of-w minima (the MOSS scheme). */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    bridge.column(graft.functions.WinnowFingerprints(bridge.expression(text), k, w))

  /** MinHash signature over a precomputed hash set (one shingle pass shared
    * between LSH banding and Jaccard verification). */
  def minhash_from_hashes(hashes: Column, numHashes: Int): Column =
    bridge.column(MinhashFromHashes(bridge.expression(hashes), numHashes))

  /** Fused SimHash fingerprint (codegen'd kernel). */
  def simhash_fused(text: Column, bits: Int): Column =
    bridge.column(SimHash(bridge.expression(text), bits))

  /** Exact Jaccard of two sorted distinct long arrays (merge walk). */
  def jaccard_sorted(a: Column, b: Column): Column =
    bridge.column(JaccardSorted(bridge.expression(a), bridge.expression(b)))

  /** Early-abort threshold gate: false only when round(jaccard,6) >= t is
    * provably impossible (no false negatives) — run it before the exact
    * jaccard so the full merge touches only plausible pairs. */
  def jaccard_ge(a: Column, b: Column, t: Double): Column =
    bridge.column(JaccardGe(bridge.expression(a), bridge.expression(b), t))

  /** KMV distinct-count sketch aggregate: bounded k-minimum-values estimator
    * over 48-bit md5 hashes; exact below k distinct values, md5-deterministic
    * (oracle-reproducible) above. */
  def kmv_distinct(c: Column, k: Int): Column =
    bridge.column(graft.functions.KmvDistinct(bridge.expression(c), k)
      .toAggregateExpression())

  /** The KMV sketch ITSELF (sorted k smallest distinct hashes,
    * `array<long>`) — the mergeable per-file form a metadata layer
    * stores; union + re-truncate reproduces a single-pass sketch
    * bit-for-bit. */
  def kmv_sketch(c: Column, k: Int): Column =
    bridge.column(graft.functions.KmvSketchValues(bridge.expression(c), k)
      .toAggregateExpression())

  /** HLL distinct-count sketch aggregate (m=256 registers, md5-derived
    * bucket/rho so the registers AND the raw estimate are
    * oracle-reproducible). Returns (est_hll, registers_sum, n_zero). */
  def hll_distinct(c: Column): Column =
    bridge.column(graft.functions.HllDistinct(bridge.expression(c))
      .toAggregateExpression())

  /** The storable form of [[hll_distinct]]: the 256-byte register blob.
    * Persist per day/partition; roll up later with [[hll_merge_est]]. */
  def hll_registers(c: Column): Column =
    bridge.column(graft.functions.HllRegisters(bridge.expression(c))
      .toAggregateExpression())

  /** Merge stored HLL register blobs (element-wise max — lossless and
    * associative) and return the union's (est_hll, registers_sum, n_zero). */
  def hll_merge_est(c: Column): Column =
    bridge.column(graft.functions.HllMergeEst(bridge.expression(c))
      .toAggregateExpression())

  /** Roaring64 bitmap aggregate over a long column (serialized `binary`
    * blob, `writeDv`-codec compatible) — the distributed deletion-vector
    * build: O(files) compressed blobs reach the driver, never the
    * matched (file, ordinal) rows. Merges OR partial bitmaps map-side. */
  def roaring_agg(c: Column): Column =
    bridge.column(graft.functions.RoaringAgg(bridge.expression(c))
      .toAggregateExpression())

  /** Bloom-bitset aggregate over the build side's join keys (cast to
    * string): array<bigint> of numBits/64 words, md5-double-hashed so the
    * content is engine-reproducible. Merges are word-wise OR (map-side
    * partials ship the bitset, never the keys). */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    bridge.column(graft.functions.BloomAgg(
      bridge.expression(c.cast("string")), numBits, numHashes)
      .toAggregateExpression())

  /** Probe-side Bloom membership test (codegen'd, short-circuiting); the
    * numBits/numHashes must match the building bloom_agg. No false
    * negatives, so a pre-join filter on it never changes the join result. */
  def bloom_contains(bits: Column, c: Column, numBits: Int, numHashes: Int): Column =
    bridge.column(graft.functions.BloomContains(
      bridge.expression(bits), bridge.expression(c.cast("string")), numBits, numHashes))

  /** Bounded-heap per-group top-k aggregate: keeps the k payloads with the
    * highest (ord DESC, tie ASC) rank; partial-aggregates map-side so only
    * k rows per group per partition cross the shuffle. */
  def top_k_by(payload: Column, ord: Column, tie: Column, k: Int): Column =
    bridge.column(graft.functions.TopKBy(
      bridge.expression(payload), bridge.expression(ord), bridge.expression(tie), k)
      .toAggregateExpression())

  /** Stable 48-bit integer from the md5 hex prefix. md5 is identical across
    * engines (Spark, DuckDB, Python), which makes every hash-derived operator
    * (dedup, MinHash, SimHash, LSH) oracle-checkable bit-for-bit. 12 hex chars
    * = 48 bits, comfortably inside a signed 64-bit integer. */
  def md5_prefix_long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Character k-shingles of a string (row-local, no shuffle). */
  def shingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => text.substr(i, lit(k)))

  /** Whitespace tokenization shared by the text-analysis operators. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Dot product of two numeric arrays — fused kernel with double
    * accumulation in array order (bitwise-identical to the HOF fold it
    * replaced, so float inputs still match the oracle's math). */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  def l2_norm(a: Column): Column =
    bridge.column(L2Norm(bridge.expression(a)))

  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** Fused language-ID kernel (see operators.TextAnalysis for semantics). */
  def lang_id(text: Column): Column =
    bridge.column(LangId(bridge.expression(text)))

  /** NFC normalization + control-char scrub (tab/newline kept) — see
    * functions.UnicodeUtil. */
  def nfc_clean(text: Column): Column =
    bridge.column(graft.functions.NfcClean(bridge.expression(text)))

  /** Fused quality-signal kernel (one pass: counts, ratios, composite
    * score) — see functions.QualityUtil for the parity contract. */
  def quality_signals(text: Column): Column =
    bridge.column(graft.functions.QualitySignals(bridge.expression(text)))

  /** Fused Gopher-repetition kernel (one pass: duplicate-segment counts,
    * char fractions, top-bigram multiplicity) — see functions.GopherUtil
    * for the parity contract. */
  def gopher_repetition(text: Column, w: Int): Column =
    bridge.column(graft.functions.GopherRepetition(bridge.expression(text), w))

  /** Fused per-document term counting (lowercase, \s+ tokenize, min-length
    * filter, duplicate counting in one codegen pass) — see
    * functions.TermCountsUtil. */
  def term_counts(text: Column, minLen: Int): Column =
    bridge.column(graft.functions.TermCounts(bridge.expression(text), minLen))

  /** Product-quantization code assignment against a fixed quantized codebook
    * (`codebook(s*ksub + c)` = centroid c of subspace s) — integer math
    * throughout, see functions.PqUtil. */
  def pq_encode(vec: Column, codebook: Seq[Seq[Long]], m: Int, ksub: Int): Column =
    bridge.column(graft.functions.PqEncode(bridge.expression(vec), codebook, m, ksub))

  /** Broadcast-codebook argmax-cosine cell assignment (plan size O(1) in
    * nlist — see functions.CellUtil). */
  def cell_assign(vec: Column, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    bridge.column(graft.functions.CellAssign(bridge.expression(vec), bc))

  /** Per-centroid cosine score array over a broadcast codebook. */
  def cell_scores(vec: Column, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    bridge.column(graft.functions.CellScores(bridge.expression(vec), bc))

  /** Centroid vector lookup by 0-based cell index over a broadcast codebook. */
  def centroid_at(cell: Column, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    bridge.column(graft.functions.CentroidAt(bridge.expression(cell), bc))

  /** Sign-bit LSH bucket over a broadcast hyperplane matrix. */
  def hyperplane_bucket(vec: Column, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    bridge.column(graft.functions.HyperplaneBucket(bridge.expression(vec), bc))

  /** Per-list ADC table-lookup distance over broadcast quantized tables. */
  def adc_distance(list: Column, codes: Column,
                   bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]]): Column =
    bridge.column(graft.functions.AdcDistance(
      bridge.expression(list), bridge.expression(codes), bc))

  /** Register every custom expression as a SQL function on a running session
    * (same definition list as [[GraftExtensions]], the build-time path). */
  def register(spark: SparkSession): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    // the engine's optimizer rules ride the same session-setup hook
    graft.plans.GraftRules.install(spark)
  }
}
