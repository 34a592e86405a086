package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Packing, TfIdf}

/** Specs for the round-4 corpus-preparation operators: benchmark
  * decontamination, training-sequence packing, and TF-IDF keyword
  * extraction. */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Decontaminate ----

  test("splitLeakage: only cross-split pairs, exact/near disjoint, correct evidence") {
    import graft.operators.Sampling
    import graft.sources.Tables
    val weights = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Decontaminate.splitLeakage(docs, "doc_id", "text", weights,
        threshold = 0.2).collect()
    assert(got.nonEmpty, "sf0.001 corpus must contain at least one leaked pair")
    val splits = Sampling.assignSplit(docs, "doc_id", weights)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val text = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    got.foreach { r =>
      val (kind, a, b) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (sa, sb, j) = (r.getString(3), r.getString(4), r.getDouble(5))
      assert(a < b, s"pair ($a,$b) must be ordered")
      assert(sa != sb && splits(a) == sa && splits(b) == sb,
        s"($a,$b) must straddle splits with the deterministic assignment")
      assert(seen.add((a, b)), s"pair ($a,$b) reported twice")
      if (kind == "exact") assert(text(a) == text(b) && j == 1.0)
      else assert(kind == "near" && j >= 0.2 && text(a) != text(b))
    }
    // exact dups in the SAME split are not leakage and must not appear
    val sameSplitExact = text.toSeq.groupBy(_._2).values
      .filter(_.size > 1).flatMap(_.map(_._1).sorted.sliding(2))
      .collect { case Seq(a, b) if splits(a) == splits(b) => (a, b) }
    sameSplitExact.foreach(p => assert(!seen.contains(p)))
  }

  test("a document identical to a benchmark doc is fully contaminated") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "completely different words here entirely"),
      (3L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Decontaminate.contamination(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_matched", "contaminated")
      .as[(Long, Int, Long, Int)].collect().toSeq
    // doc 1: grams {abc, bcd} both in bench -> ratio 1.0
    // doc 2: zero overlap
    // doc 3: gram "alpha beta gamma" matches, "beta gamma epsilon" doesn't -> 0.5
    assert(got == Seq((1L, 2, 2L, 1), (2L, 3, 0L, 0), (3L, 2, 1L, 1)))
  }

  test("contamination ratio is matched/total distinct grams") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text") // 3 trigrams
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text") // gram "a b c"
    val row = Decontaminate.contamination(corpus, bench, "doc_id", "text", n = 3)
      .select("n_grams", "n_matched", "overlap_ratio").as[(Int, Long, Double)].head()
    assert(row == ((3, 1L, 1.0 / 3)))
  }

  test("empty benchmark leaves every doc clean") {
    val corpus = Seq((1L, "x y z")).toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    val row = Decontaminate.contamination(corpus, bench, "doc_id", "text", n = 2)
      .select("n_matched", "contaminated").as[(Long, Int)].head()
    assert(row == ((0L, 0)))
  }

  // ---- Vocabulary ----

  test("vocabulary ranks by doc_freq desc then term, with corpus totals") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana apple date")).toDF("doc_id", "text")
    val got = TfIdf.vocabulary(docs, "text", topV = 10, minTokenLen = 3, minDf = 1)
      .as[(String, Long, Long)].collect().toSeq
    // banana in 3 docs (3 occurrences), apple in 2 (3 occ), cherry/date in 1
    assert(got == Seq(
      ("banana", 3L, 3L), ("apple", 2L, 3L), ("cherry", 1L, 1L), ("date", 1L, 1L)))
  }

  test("vocabulary applies minDf and the top-V cut") {
    val docs = Seq(
      (1L, "aaa bbb"), (2L, "aaa ccc"), (3L, "aaa bbb")).toDF("doc_id", "text")
    val got = TfIdf.vocabulary(docs, "text", topV = 1, minTokenLen = 3, minDf = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("aaa", 3L, 3L))) // bbb (df=2) cut by topV, ccc by minDf
  }

  test("postingLists orders postings by doc_id and excludes the df band edges") {
    val docs = Seq(
      (3L, "apple apple banana the"),
      (1L, "apple banana the"),
      (2L, "apple the"),
      (4L, "cherry the")).toDF("doc_id", "text")
    // the: df=4 > maxDf (the stopword exclusion); cherry: df=1 < minDf
    val got = TfIdf.postingLists(docs, "doc_id", "text",
        topV = 10, minTokenLen = 3, minDf = 2, maxDf = 3)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("apple", 3L, 4L, "1:1,2:1,3:2"), // doc-ordered even though 3 came first
      ("banana", 2L, 2L, "1:1,3:1")))
  }

  // ---- Packing ----

  test("packing lays groups out independently with exact integer arithmetic") {
    // 3 docs of 4 tokens in group A, budget 6: starts 0,4,8
    val docs = Seq(
      ("A", 1L, "t t t t"), ("A", 2L, "t t t t"), ("A", 3L, "t t t t"),
      ("B", 9L, "u u")).toDF("lang", "doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", "text", seqTokens = 6, Seq("lang"))
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "tok_start", "seq_id", "seq_offset", "n_seqs")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 0L, 0L, 0L, 1L),  // tokens 0-3 inside seq 0
      ("A", 2L, 4L, 0L, 4L, 2L),  // tokens 4-7 span seqs 0-1
      ("A", 3L, 8L, 1L, 2L, 1L),  // tokens 8-11 inside seq 1
      ("B", 9L, 0L, 0L, 0L, 1L))) // group B starts its own stream
  }

  test("packed stream is gapless: tok_start = previous start + previous tokens") {
    val docs = CorpusFixtures.documents(spark)
    val got = Packing.packSequences(docs, "doc_id", "text", seqTokens = 64, Seq("lang"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val bad = got.withColumn("_prev_end",
        lag(col("tok_start") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("tok_start") =!= col("_prev_end"))
    assert(bad.isEmpty)
  }

  test("a NULL-text document occupies zero tokens and does not shift the layout") {
    val docs = Seq(
      ("A", 1L, Some("t t t")),
      ("A", 2L, None: Option[String]),
      ("A", 3L, Some("u u"))).toDF("lang", "doc_id", "text")
    val got = Packing.packSequences(docs, "doc_id", "text", seqTokens = 4, Seq("lang"))
      .orderBy("doc_id").select("doc_id", "n_tokens", "tok_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 0L, 3L), (3L, 2L, 3L)))
  }

  test("packing refuses a global (ungrouped) window") {
    val docs = Seq(("x", 1L, "a")).toDF("lang", "doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.packSequences(docs, "doc_id", "text", 10, Nil)
    }
  }

  test("property: packing layout replays from a sequential simulation") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.listOfN(40, Gen.chooseNum(1, 30))
    PropHelper.check(Prop.forAll(gen, Gen.chooseNum(5, 50)) { (tokenCounts, budget) =>
      val docs = tokenCounts.zipWithIndex.map { case (n, i) =>
        ("g", i.toLong, List.fill(n)("t").mkString(" "))
      }.toDF("lang", "doc_id", "text")
      val got = Packing.packSequences(docs, "doc_id", "text", budget, Seq("lang"))
        .orderBy("doc_id")
        .select("n_tokens", "tok_start", "seq_id", "seq_offset", "n_seqs")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // sequential replay: walk the concatenated token stream
      var cursor = 0L
      val expect = tokenCounts.map { n =>
        val start = cursor
        val first = start / budget
        val last = (start + n - 1) / budget
        cursor += n
        (n.toLong, start, first, start % budget, last - first + 1)
      }
      got == expect
    }, minTests = 20)
  }

  test("property: contamination ratio is within [0,1] and grows with the benchmark") {
    import org.scalacheck.{Gen, Prop}
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    PropHelper.check(Prop.forAll(Gen.listOfN(8, doc), Gen.listOfN(2, doc),
        Gen.listOfN(2, doc)) { (corpus, bench1, bench2) =>
      val c = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def ratios(benchDocs: Seq[String]) =
        Decontaminate.contamination(c,
            benchDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
            "doc_id", "text", n = 2)
          .select("doc_id", "overlap_ratio").as[(Long, Double)].collect().toMap
      val r1 = ratios(bench1)
      val r12 = ratios(bench1 ++ bench2)
      r1.values.forall(v => v >= 0.0 && v <= 1.0) &&
        r1.keys.forall(k => r12(k) >= r1(k)) // a larger benchmark never shrinks overlap
    }, minTests = 15)
  }

  // ---- TfIdf ----

  test("corpus-wide terms rank below document-specific terms") {
    // "common" appears in every doc (df=3 -> idf 1); each doc has one rare term
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common common yak"),
      (3L, "common xenon xenon")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1, minTokenLen = 3)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top == Map(1L -> "zebra", 2L -> "yak", 3L -> "xenon"))
  }

  test("bm25Search ranks by the documented rational-BM25 formula, zero-score docs excluded") {
    val docs = Seq(
      (1L, "spark spark window engine"),
      (2L, "window query planner"),
      (3L, "other words here entirely")).toDF("doc_id", "text")
    val got = TfIdf.bm25Search(docs, "doc_id", "text",
        queryTerms = Seq("spark", "window"), k = 10)
      .as[(Long, Double)].collect().toSeq
    // hand replay with the same expression tree: N=3, sumdl=11, avgdl=11/3
    def term(tf: Double, df: Double, dl: Double): Double =
      if (tf == 0) 0.0
      else ((3.0 - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (11.0 / 3.0)))
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Seq(
      1L -> r6(term(2, 1, 4) + term(1, 2, 4)),
      2L -> r6(term(0, 1, 3) + term(1, 2, 3)))
      .sortBy { case (id, s) => (-s, id) }
    assert(got == expect)
    // doc 3 holds no query term: excluded, not scored 0
    assert(!got.exists(_._1 == 3L))
  }

  test("score ties break alphabetically on the term (string tie through the heap)") {
    val docs = Seq((1L, "bbb aaa ccc")).toDF("doc_id", "text")
    // all three terms: tf equal, df equal -> equal scores
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2, minTokenLen = 3)
      .orderBy("rank").select("rank", "term").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "aaa"), (2, "bbb")))
  }

  test("short tokens are dropped from the vocabulary") {
    val docs = Seq((1L, "of to in elephant")).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 5, minTokenLen = 3)
      .select("term").as[String].collect().toSeq
    assert(got == Seq("elephant"))
  }

  test("term_counts kernel: counts sum to n_tokens and terms match the HOF tokenization") {
    val docs = CorpusFixtures.documents(spark)
      .unionByName(Seq((9001L, "en", ""), (9002L, "en", "  "), (9003L, "en", "ab AB aB"),
        (9004L, "en", "x yy zzz zzz\tzzz")).toDF("doc_id", "lang", "text"))
    val viaKernel = docs
      .select(col("doc_id"), graft.Functions.term_counts(col("text"), 3).as("_tc"))
      .select(col("doc_id"), col("_tc.n_tokens").as("nt"), col("_tc.terms").as("terms"))
    // invariant: sum of per-term counts == kept-token count
    val badSum = viaKernel.filter(
      coalesce(aggregate(col("terms"), lit(0), (a, t) => a + t.getField("cnt")), lit(0))
        =!= col("nt")).count()
    assert(badSum == 0)
    // terms+counts equal the declarative formulation
    val toksHof = filter(split(trim(lower(col("text"))), "\\s+"), t => length(t) >= 3)
    val hof = docs.select(col("doc_id"), explode(toksHof).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("int").as("cnt"))
      .as[(Long, String, Int)].collect().toSeq.sorted
    val kern = viaKernel.select(col("doc_id"), explode(col("terms")).as("t"))
      .select(col("doc_id"), col("t.term"), col("t.cnt"))
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(kern == hof)
  }

  test("tfidf matches the row_number window formulation on a larger corpus") {
    val docs = CorpusFixtures.documents(spark)
    val viaAgg = TfIdf.topTerms(docs, "doc_id", "text", k = 3, minTokenLen = 3)
      .select("doc_id", "rank", "term")
      .as[(Long, Int, String)].collect().toSeq.sorted
    // independent formulation: explode + window
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => length(t) >= 3)
    val tc = docs.select(col("doc_id"), size(toks).as("n_tokens"),
        explode(toks).as("term"))
      .groupBy("doc_id", "n_tokens", "term").agg(count(lit(1)).as("cnt"))
    val df = tc.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    val viaWindow = tc.join(df, "term")
      .withColumn("score", col("cnt").cast("double") * n / col("n_tokens") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term")
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(viaAgg == viaWindow)
  }

  test("bigramVocabulary counts adjacent pairs with doc and pair frequency") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b","b a","a b"
      (2L, "a b c"),     // bigrams: "a b","b c"
      (3L, "solo"),      // no bigram
      (4L, "")).toDF("doc_id", "text")
    val all = TfIdf.bigramVocabulary(docs, "doc_id", "text", topV = 10, minDf = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(all == Seq(("a b", 2L, 3L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
    // minDf prunes, topV caps after the (doc_freq desc, bigram) order
    val pruned = TfIdf.bigramVocabulary(docs, "doc_id", "text", topV = 10, minDf = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(pruned == Seq(("a b", 2L, 3L)))
    val capped = TfIdf.bigramVocabulary(docs, "doc_id", "text", topV = 2, minDf = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(capped == Seq(("a b", 2L, 3L), ("b a", 1L, 1L)))
  }
}

/** Tiny deterministic documents fixture shared by the corpus-prep tests. */
object CorpusFixtures {
  def documents(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0L until 200L).map { i =>
      val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"
      val n = (i % 17 + 1).toInt
      val text = (0 until n).map(j => words(((i * 31 + j * 7) % 10).toInt)).mkString(" ")
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
  }
}
