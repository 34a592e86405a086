package graft

import org.apache.spark.sql.functions._

import graft.Functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Fused langid/cosine kernels must match the interpreted HOF formulations
  * they replaced (which live here as the equivalence spec). */
class TextAnalysisSpec extends SparkTestBase {

  test("chunk: full coverage, correct overlap, short-doc and last-chunk edges") {
    import spark.implicits._
    val doc = (1 to 13).map(i => s"w$i").mkString(" ") // 13 tokens
    val df = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(df, "doc_id", "text", chunkTokens = 5, overlap = 2)
      .orderBy("doc_id", "chunk_no").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // stride 3: starts 0,3,6,9 -> ceil((13-2)/3) = 4 chunks
    assert(d1.map(_.getInt(2)).toSeq == Seq(0, 3, 6, 9))
    assert(d1.map(_.getInt(3)).toSeq == Seq(5, 5, 5, 4)) // last chunk short
    assert(d1(1).getString(4) == "w4 w5 w6 w7 w8") // overlap: w4,w5 shared with chunk 0
    // every token appears in some chunk (reconstruction from stride slices)
    val covered = d1.flatMap(r => r.getString(4).split(" ")).toSet
    assert(covered == (1 to 13).map(i => s"w$i").toSet)
    // short doc -> exactly one chunk; empty doc -> one chunk of the '' token
    assert(got.count(_.getLong(0) == 2L) == 1)
    assert(got.filter(_.getLong(0) == 2L).head.getInt(3) == 2)
    assert(got.count(_.getLong(0) == 3L) == 1)
  }

  test("removeBoilerplate drops cross-doc repeated segments and reassembles the rest") {
    import spark.implicits._
    // 4-token segments; "the same footer line" appears in docs 1,2,3
    val footer = "the same footer line"
    val df = Seq(
      (1L, s"alpha beta gamma delta $footer"),
      (2L, s"epsilon zeta eta theta $footer"),
      (3L, footer),
      (4L, "iota kappa lambda mu nu xi")).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text",
        segmentTokens = 4, minDocs = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((2, 1, m("alpha beta gamma delta"))))
    assert(got(2L) == ((2, 1, m("epsilon zeta eta theta"))))
    // a doc that is ONLY boilerplate still emits a row, with empty survivors
    assert(got(3L) == ((1, 1, m(""))))
    // no cross-doc repeats -> nothing removed, text intact (normalized)
    assert(got(4L) == ((2, 0, m("iota kappa lambda mu nu xi"))))
  }

  test("repetitionSignals: duplicate n-gram ratio, short-doc and degenerate edges") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),    // 7 trigrams, 3 distinct -> ratio 4/7
      (2L, "all words here differ"), // no repetition -> 0.0
      (3L, "a b"),                   // shorter than n -> 0 grams, ratio 0.0
      (4L, "x x x x x")).toDF("doc_id", "text") // fully degenerate -> 2/3
    val got = TextAnalysis.repetitionSignals(df, "text", n = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_ngrams") == 7 && got(0).getAs[Int]("n_distinct_ngrams") == 3)
    assert(math.abs(got(0).getAs[Double]("dup_ngram_ratio") - 4.0 / 7.0) < 1e-12)
    assert(got(1).getAs[Double]("dup_ngram_ratio") == 0.0)
    assert(got(2).getAs[Int]("n_ngrams") == 0 && got(2).getAs[Double]("dup_ngram_ratio") == 0.0)
    assert(math.abs(got(3).getAs[Double]("dup_ngram_ratio") - 2.0 / 3.0) < 1e-12)
  }

  test("redactPii: emails redacted before digit runs, counts audit both categories") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b_c+x@ex-site.org and 12345678 end"),
      (2L, "id 999888777 and user2@a.io and u3@b.co"),
      (3L, "clean text 123 short")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "text").orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_emails") == 1 && got(0).getAs[Int]("n_digit_runs") == 1)
    assert(got(0).getAs[String]("redacted") == "mail <EMAIL> and <NUMBER> end")
    assert(got(1).getAs[Int]("n_emails") == 2 && got(1).getAs[Int]("n_digit_runs") == 1)
    assert(got(1).getAs[String]("redacted") == "id <NUMBER> and <EMAIL> and <EMAIL>")
    // short digit run (< 7) is NOT pii; email digits don't double-count
    assert(got(2).getAs[Int]("n_emails") == 0 && got(2).getAs[Int]("n_digit_runs") == 0)
    assert(got(2).getAs[String]("redacted") == "clean text 123 short")
  }

  test("winnow_fingerprints: rolling hash equals the direct polynomial; edge cases") {
    import spark.implicits._
    import graft.Functions.winnow_fingerprints
    val M = 2147483647L
    def direct(s: String, k: Int): Seq[Long] =
      (0 to math.max(s.length - k, 0)).map { i =>
        s.substring(i, math.min(i + k, s.length))
          .foldLeft(0L)((a, c) => (a * 257 + c) % M)
      }
    val text = "the quick brown fox jumps over the lazy dog"
    val got = Seq(text).toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()(0)
    // every selected fingerprint is a real window hash, sorted distinct
    val hashes = direct(text, 8)
    assert(got.nonEmpty && got.toSet.subsetOf(hashes.toSet))
    assert(got == got.sorted && got.distinct == got)
    // the winnowing guarantee: two docs sharing a long-enough substring
    // (>= w + k - 1 chars) share at least one fingerprint
    val shared = "a very distinctive shared passage here"
    val doc1 = s"prefix one $shared suffix alpha"
    val doc2 = s"completely different beginning $shared and ending"
    val fps = Seq(doc1, doc2).toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()
    assert((fps(0).toSet & fps(1).toSet).nonEmpty, "shared passage must share a fingerprint")
    // shorter than k: one whole-text hash; empty text: the zero hash
    val tiny = Seq("abc").toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 4).as("fp")).as[Seq[Long]].collect()(0)
    assert(tiny == Seq("abc".foldLeft(0L)((a, c) => (a * 257 + c) % M)))
    val empty = Seq("").toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 4).as("fp")).as[Seq[Long]].collect()(0)
    assert(empty == Seq(0L))
  }
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def langIdHof(text: org.apache.spark.sql.Column) = {
    val toks = split(trim(lower(text)), "\\s+")
    def hits(words: Seq[String]) = size(filter(toks, t => t.isInCollection(words)))
    val scored = array(TextAnalysis.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hits(words).as("hits"), lit(lang).as("lang"))
    }: _*)
    val maxHits = array_max(scored).getField("hits")
    val winner = array_min(transform(
      filter(scored, s => s.getField("hits") === maxHits), s => s.getField("lang")))
    when(maxHits > 0, winner).otherwise(lit("und"))
  }

  test("urlFilter extracts domains, dedups them sorted, and flags blocklist hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see https://bad.example/a and http://bad.example/b plus https://ok.example"),
      (2L, "no urls at all"),
      (3L, "https://ok.example only")).toDF("doc_id", "text")
    val got = TextAnalysis.urlFilter(docs, "text", Seq("bad.example"))
      .select("doc_id", "n_urls", "domains_csv", "blocked")
      .as[(Long, Int, String, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 3, "bad.example,ok.example", 1),
      (2L, 0, "", 0),
      (3L, 1, "ok.example", 0)))
  }

  test("fused quality_signals equals the HOF composition, bit for bit") {
    import spark.implicits._
    val real = Tables.documents(spark, sfDir).select("text")
    val dirty = Seq("", " ", "a", "  padded  ", "\tTabs\nand newlines\t",
      "the the the of of to,,, !!!", "unicode éè café ...",
      "a" * 5000, ".,!?;:" * 10).toDF("text")
    val docs = real.unionByName(dirty)
    val cols = Seq("n_chars", "n_tokens", "punct_ratio", "stopword_ratio",
      "mean_token_len", "quality_score")
    val fused = TextAnalysis.qualitySignals(docs, "text")
    val hof = TextAnalysis.qualitySignalsHof(docs, "text")
    val diff = fused.select(col("text"), struct(cols.map(col): _*).as("f"))
      .join(hof.select(col("text"), struct(cols.map(col): _*).as("h")), "text")
      .filter(col("f") =!= col("h"))
    assert(diff.isEmpty, diff.collect().take(3).mkString("\n"))
  }

  test("fused lang_id equals the interpreted HOF composition") {
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.select(lang_id(col("text")).as("fused"), langIdHof(col("text")).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("lang_id edge cases: empty, mixed, no-stopword text") {
    val got = Seq("", "the la der el", "zzz qqq", "der die das", "  EL la Los  ")
      .toDF("text").select(lang_id(col("text"))).collect().map(_.getString(0)).toSeq
    // "the la der el": one hit each for en; la->es+fr, der->de, el->es => es wins (2)
    assert(got == Seq("und", "es", "und", "de", "es"))
  }

  private def dotHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def cosineHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def l2(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dotHof(a, b) / (l2(a) * l2(b))
  }

  test("fused cosine/dot are bitwise-identical to the HOF folds on float vectors") {
    val emb = Tables.embeddings(spark, sfDir).limit(300)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib")).limit(2000)
    val diff = pairs.select(
      cosine(col("va"), col("vb")).as("fc"), cosineHof(col("va"), col("vb")).as("hc"),
      dot(col("va"), col("vb")).as("fd"), dotHof(col("va"), col("vb")).as("hd"))
      .filter(col("fc") =!= col("hc") || col("fd") =!= col("hd")).count()
    assert(diff == 0)
  }

  test("mixed float/double arrays (embedding vs literal plane) still work") {
    val emb = Tables.embeddings(spark, sfDir).limit(5)
    val dim = emb.select(size(col("embedding"))).collect()(0).getInt(0)
    val plane = array((0 until dim).map(i => lit(0.01 * i - 0.3)): _*)
    val rows = emb.select(dot(col("embedding"), plane).as("d")).collect()
    assert(rows.forall(r => !r.isNullAt(0)))
  }

  test("nfc_clean composes NFC and strips controls except tab/newline") {
    import spark.implicits._
    val df = Seq(
      (1L, "e\u0301clair"),          // decomposed -> composed é
      (2L, "a\r\nb\tcd"),      // CRLF -> LF, tab kept, BEL dropped
      (3L, "plain"),
      (4L, "")).toDF("id", "t")
    val got = df.select(col("id"), nfc_clean(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "\u00e9clair")
    assert(got(2L) == "a\nb\tcd")
    assert(got(3L) == "plain")
    assert(got(4L) == "")
    // idempotent: cleaning clean text changes nothing
    val twice = df.select(nfc_clean(nfc_clean(col("t"))).as("c2"))
      .as[String].collect().toSeq
    assert(twice == df.select(nfc_clean(col("t"))).as[String].collect().toSeq)
  }

  test("hashedClassifierScore matches a hand-computed md5 bucket-weight sum") {
    import spark.implicits._
    def weight(bigram: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bigram.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex, 16) % 4096
      bucket * 2654435761L % 1001L - 500L
    }
    val df = Seq(
      (1L, "The quick brown fox"),   // 3 bigrams (lowercased)
      (2L, "single"),                // no bigram -> score 0
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedClassifierScore(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "score")
      .as[(Long, Int, Long)].collect()
      .map { case (id, n, sc) => id -> ((n, sc)) }.toMap
    val expect1 = Seq("the quick", "quick brown", "brown fox").map(weight).sum
    assert(got(1L) == ((3, expect1)))
    assert(got(2L) == ((0, 0L)))
    assert(got(3L) == ((0, 0L)))
  }

  test("hashedClassifierScore is shuffle-free (row-local plan)") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = TextAnalysis.hashedClassifierScore(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("canonicalizeUrl: every RFC 3986 §6 variant collapses; non-defaults survive") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/item/5/?utm_source=feed&id=5#top",
      "http://example.com/item/5?id=5",
      "Http://www.EXAMPLE.com/item/5/?id=5&utm_campaign=x&ref=abc",
      // and forms that must NOT collapse into the above:
      "http://example.com:8080/item/5?id=5",   // non-default port kept
      "https://example.com/item/5?id=5",       // scheme is part of identity
      "http://example.com/item/5?id=6",        // different kept param
      "http://example.com/",                   // root path: slash kept
      "http://example.com/a?b=2&a=1")          // params sorted
    val got = urls.toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    assert(got.take(3).toSet == Set("http://example.com/item/5?id=5"))
    assert(got(3) == "http://example.com:8080/item/5?id=5")
    assert(got(4) == "https://example.com/item/5?id=5")
    assert(got(5) == "http://example.com/item/5?id=6")
    assert(got(6) == "http://example.com/")
    assert(got(7) == "http://example.com/a?a=1&b=2")
  }

  test("urlDedup: keeps the latest id per canonical key, counts raw variants") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://www.site.com/p?utm_source=a"),
      (2L, "HTTP://site.com:80/p"),
      (3L, "http://site.com/p"),
      (9L, "https://other.com/q")).toDF("doc_id", "url")
    val got = TextAnalysis.urlDedup(df, "doc_id", "url")
      .orderBy("canonical_url")
      .as[(String, Long, Long, Long)].collect()
    assert(got(0) == (("http://site.com/p", 3L, 3L, 3L)))
    assert(got(1) == (("https://other.com/q", 9L, 1L, 1L)))
  }

  test("gopherRepetition: dup-segment and top-bigram arithmetic on crafted docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"), // segs(w=2): [a b][a b][c]; bigrams: a b, b a, a b, b c
      (2L, "x"),         // 1 token: one segment, no bigrams
      (3L, "p q r s"))   // all unique
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(df, "text", segTokens = 2)
      .select("doc_id", "n_segments", "n_dup_segments", "dup_segment_frac",
        "dup_segment_char_frac", "n_bigrams", "top_bigram_count", "top_bigram_frac",
        "top_bigram_char_frac")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, Long, Long, Double, Double)].collect()
    // doc 1: 2 of 3 segments duplicate; chars 3+3 of 3+3+1; mode bigram "a b" ×2
    // of 4; the paper's char gate: 2 occurrences × 3 chars over 9 text chars
    assert(got(0) == ((1L, 3L, 2L, 2.0 / 3, 6.0 / 7, 4L, 2L, 0.5, 6.0 / 9)))
    // doc 2: degenerate edges — no duplicates, no bigrams, fracs pinned to 0
    assert(got(1) == ((2L, 1L, 0L, 0.0, 0.0, 0L, 0L, 0.0, 0.0)))
    // doc 3: count ties across all three bigrams — the lexicographically
    // smallest ("p q", 3 chars) carries the char fraction: 1 × 3 / 7
    assert(got(2) == ((3L, 2L, 0L, 0.0, 0.0, 3L, 1L, 1.0 / 3, 3.0 / 7)))
  }

  test("gopherRepetition is shuffle-free (row-local plan)") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = TextAnalysis.gopherRepetition(df, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("fused gopher_repetition equals the staged HOF composition, bit for bit") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val cols = Seq("doc_id", "n_segments", "n_dup_segments", "dup_segment_frac",
      "dup_segment_char_frac", "n_bigrams", "top_bigram_count", "top_bigram_frac",
      "top_bigram_char_frac")
    for (w <- Seq(1, 2, 5)) {
      val a = TextAnalysis.gopherRepetition(df, "text", w)
        .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
      val b = TextAnalysis.gopherRepetitionHof(df, "text", w)
        .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
      assert(a.sameElements(b), s"kernel/HOF divergence at w=$w")
    }
  }

  test("gopherLineRepetition: run fold counts every occurrence of a duplicated line") {
    import spark.implicits._
    val df = Seq(
      // "x y" ×3 (3 chars each -> 9 dup chars of 13), "solo" once; blank line ignored
      (1L, "x y\nsolo\n\nx y\nx y"),
      (2L, "only one line"),
      (3L, ""),                      // no lines at all
      (4L, "a\na\nb\nb\nc"))         // two runs of 2 + one singleton
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherLineRepetition(df, "text")
      .select("doc_id", "n_lines", "n_dup_lines", "dup_line_frac", "dup_line_char_frac")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got(0) == ((1L, 4L, 3L, 0.75, 9.0 / 13)))
    assert(got(1) == ((2L, 1L, 0L, 0.0, 0.0)))
    assert(got(2) == ((3L, 0L, 0L, 0.0, 0.0)))
    assert(got(3) == ((4L, 5L, 4L, 0.8, 4.0 / 5)))
    // row-local: no shuffle in the plan
    val plan = TextAnalysis.gopherLineRepetition(df, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("removeBoilerplateLines: cross-doc lines drop, within-doc repeats survive") {
    import spark.implicits._
    val df = Seq(
      (1L, "HEADER\nbody one\nbody one\nFOOT"),
      (2L, "HEADER\nbody two\nFOOT"),
      (3L, "HEADER\nFOOT"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplateLines(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    // HEADER/FOOT are in all 3 docs -> removed; "body one" repeats only
    // within doc 1 (df = 1) -> BOTH copies survive
    def md5Of(sq: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(sq.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0) == ((1L, 4, 2, md5Of("body one\nbody one"))))
    assert(got(1) == ((2L, 3, 2, md5Of("body two"))))
    assert(got(2) == ((3L, 2, 2, md5Of(""))))
  }
}
