package graft

import org.apache.spark.sql.functions._

import graft.Functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dedup kernels: the fused codegen expressions must be bit-identical to the
  * interpreted HOF compositions they replaced, and LSH must survive a
  * degenerate corpus without going quadratic. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The round-1 interpreted formulation of the MinHash signature, kept here
    * as the equivalence spec for the fused kernel. */
  private def minhashHof(text: org.apache.spark.sql.Column, k: Int, n: Int) = {
    val sh = transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => text.substr(i, lit(k)))
    val hashes = array_distinct(transform(sh, g => md5_prefix_long(g)))
    transform(
      sequence(lit(0L), lit(n - 1L)),
      j => array_min(transform(hashes, h =>
        pmod(h * (j * lit(2L) + lit(1L)) + pmod(j * lit(2654435761L), lit(2147483647L)),
             lit(2147483647L)))))
  }

  test("fused minhash_signature equals the interpreted HOF composition") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val diff = docs.select(
      minhash_signature(col("text"), 5, 16).as("fused"),
      minhashHof(col("text"), 5, 16).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("fused simhash equals the interpreted bit-vote composition") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val toks = split(trim(col("text")), "\\s+")
    val hs = transform(toks, t => md5_prefix_long(t))
    val hof = aggregate(
      sequence(lit(31), lit(0), lit(-1)),
      lit(0L),
      (acc, b) => acc * 2 + when(
        aggregate(hs, lit(0L),
          (s, h) => s + (pmod(call_function("shiftright", h, b), lit(2L)) * 2 - 1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    val diff = docs.select(simhash_fused(col("text"), 32).as("fused"), hof.as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("edge cases: empty, single-char, whitespace-only, unicode text") {
    val df = Seq("", "x", "     ", "a b  c", "héllo wörld", "\ttab\nnewline")
      .toDF("text")
    val rows = df.select(
      minhash_signature(col("text"), 5, 16).as("f_sig"),
      minhashHof(col("text"), 5, 16).as("h_sig"),
      simhash_fused(col("text"), 32).as("f_sim"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("shingle_hash_set is sorted-distinct and jaccard_sorted matches set math") {
    val df = Seq(("a", "abcdefgh"), ("b", "abcdefgh"), ("c", "zyxwvuts")).toDF("id", "text")
    val sets = df.select(col("id"), shingle_hash_set(col("text"), 5).as("s"))
    val rows = sets.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a") == rows("a").sorted && rows("a").distinct == rows("a"))
    assert(rows("a") == rows("b"))
    val j = df.as("x").crossJoin(df.as("y"))
      .select(col("x.id"), col("y.id"),
        jaccard_sorted(shingle_hash_set(col("x.text"), 5),
          shingle_hash_set(col("y.text"), 5)).as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(j(("a", "b")) == 1.0)
    assert(j(("a", "c")) == 0.0)
  }

  test("hot-bucket cap: 1k identical docs produce zero uncapped pairs, not ~500k") {
    val degenerate = spark.range(1000)
      .select(col("id"), lit("the same boilerplate text repeated everywhere").as("text"))
    val out = Dedup.minhashLsh(degenerate, "id", "text",
      k = 5, bands = 4, rowsPerBand = 4, threshold = 0.1, maxBucketSize = 100)
    // every (band,bucket) holds all 1000 docs -> all dropped by the cap
    assert(out.count() == 0)
    // with the cap above the corpus size the quadratic blowup would return
    val small = spark.range(30)
      .select(col("id"), lit("the same boilerplate text repeated everywhere").as("text"))
    val pairs = Dedup.minhashLsh(small, "id", "text",
      k = 5, bands = 4, rowsPerBand = 4, threshold = 0.1, maxBucketSize = 100)
    assert(pairs.count() == 30L * 29 / 2)
  }

  test("ngram_hash_set equals the interpreted token-n-gram composition") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val hof = {
      val toks = split(trim(col("text")), "\\s+", -1)
      array_sort(array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - lit(1), lit(1))),
        i => md5_prefix_long(concat_ws(" ", slice(toks, i, lit(2)))))))
    }
    val diff = docs.select(
      ngram_hash_set(col("text"), 2).as("fused"), hof.as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("ngramJaccard finds exact dups at 1.0, respects blocks, caps hot blocks") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps"),
      (2L, "en", "the quick brown fox jumps"),   // exact dup of 1
      (3L, "en", "the quick brown fox sleeps"),  // near dup of 1
      (4L, "de", "the quick brown fox jumps"),   // same text, other block
      (5L, "en", "completely different words entirely")
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", Seq("lang"), n = 2, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().sorted.toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out.head._3 == 1.0) // exact dup
    // hot-block cap: 500 identical docs in one block all dropped
    val degenerate = spark.range(500)
      .select(col("id"), lit("x").as("lang"), lit("same text again").as("text"))
    assert(Dedup.ngramJaccard(degenerate, "id", "text", Seq("lang"),
      n = 2, threshold = 0.1, maxBlockSize = 100).count() == 0)
  }

  test("jaccard_ge never rejects a pair the exact rounded filter accepts") {
    // random sorted hash sets across a spread of sizes and overlaps,
    // including boundary jaccards near the threshold
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val base = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong).distinct.sorted
      val other = (base.filter(_ => rnd.nextBoolean()) ++
        Seq.fill(rnd.nextInt(20))(rnd.nextInt(60) + 100L)).distinct.sorted
      (i.toLong, base, other)
    }
    val df = rows.toDF("i", "a", "b")
    for (t <- Seq(0.1, 0.25, 0.5, 0.9)) {
      val violations = df.filter(
        !jaccard_ge(col("a"), col("b"), t) &&
          round(jaccard_sorted(col("a"), col("b")), 6) >= t).count()
      assert(violations == 0, s"false negative at t=$t")
    }
  }

  test("ngramJaccard early-abort gate drops no qualifying pair (vs brute force)") {
    // the jaccard_ge gate must be invisible in the result: compare against
    // an ungated all-pairs exact Jaccard inside each block
    val docs = Tables.documents(spark, sfDir).limit(120)
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", Seq("lang"),
        n = 2, threshold = 0.3, maxBlockSize = 1000)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val sets = docs.select(col("lang"), col("doc_id"),
      ngram_hash_set(col("text"), 2).as("gset"))
    val brute = sets.as("a").join(sets.as("b"), "lang")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        round(jaccard_sorted(col("a.gset"), col("b.gset")), 6).as("j"))
      .filter(col("j") >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == brute, "size prefilter must not change the result set")
  }

  test("fuzzyMatch finds edit-distance pairs inside blocks only") {
    val recs = Seq(
      ("x", 1L, "acme corp"),
      ("x", 2L, "acme corp."),   // distance 1 from 1
      ("x", 3L, "acme inc"),     // distance 4 from 1 ("corp" -> "inc" + len)
      ("y", 4L, "acme corp"),    // same name as 1, other block
      ("x", 5L, "completely different name")
    ).toDF("block", "id", "name")
    val got = Dedup.fuzzyMatch(recs, "id", "name", Seq("block"), maxDistance = 2)
      .select("id_a", "id_b", "distance").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1)))
    // brute-force equality at the operator's parameters (length prefilter
    // provably cannot drop a qualifying pair: |len(a)-len(b)| <= distance)
    val brute = recs.as("a").join(recs.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= 2).as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
  }

  test("incrementalDedup drops re-crawls, batch dups, and near-dups of corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated corpus document with other words")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact re-crawl of 1
      (11L, "a genuinely new document nothing has seen before"),
      (12L, "a genuinely new document nothing has seen before"),    // batch dup of 11
      (13L, "the quick brown fox jumps over the lazy dog tonite"),  // near-dup of corpus 1
      (14L, "entirely fresh content with its own unique wording")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        k = 5, bands = 4, rowsPerBand = 4, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 14L))
  }

  test("incrementalDedup near-dup of an earlier batch doc drops the later id") {
    val corpus = Seq((1L, "zzz zzz zzz zzz zzz")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "some shared boilerplate sentence appears here first"),
      (21L, "some shared boilerplate sentence appears here again") // near-dup of 20
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(20L))
  }

  test("incrementalDedup via a stored (parquet round-tripped) index matches recompute") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
    val direct = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        threshold = 0.35)
      .select("doc_id").as[Long].collect().toSet
    // build the index once, persist it as parquet (the production layout),
    // read it back, and dedup the batch against the stored artifact
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
    val idx = Dedup.lshIndex(corpus, "doc_id", "text")
    idx.sets.write.parquet(s"$dir/sets")
    idx.bands.write.parquet(s"$dir/bands")
    val stored = Dedup.LshIndex(
      spark.read.parquet(s"$dir/sets"), spark.read.parquet(s"$dir/bands"))
    val viaIndex = Dedup.incrementalDedup(stored, batch, "doc_id", "text",
        k = 5, bands = 4, rowsPerBand = 4, threshold = 0.35, maxBucketSize = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == direct)
  }

  test("incrementalDedup with empty corpus reduces to within-batch dedup") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon words in a row"),
      (2L, "alpha beta gamma delta epsilon words in a row"),
      (3L, "totally different text that stands alone nicely here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("simhashNearDup banding is lossless at maxHamming < bands (vs brute force)") {
    val docs = Tables.documents(spark, sfDir).limit(80)
    val banded = Dedup.simhashNearDup(docs, "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text"), 32).as("fp"))
    val brute = fp.as("a").crossJoin(fp.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.hammingDistance(col("a.fp"), col("b.fp"), 32).as("h"))
      .filter(col("h") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute, "banding must find exactly the brute-force pairs")
    assert(Dedup.simhashNearDup(docs, "doc_id", "text").filter(col("hamming") === 0)
      .count() >= 0) // identical docs appear at distance 0 when present
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(docs, "doc_id", "text", bands = 4, maxHamming = 4)
    }
  }

  test("hammingDistance masks to the requested width") {
    val df = Seq((0xF0FL, 0x00FL)).toDF("a", "b")
    val got = df.select(
      Dedup.hammingDistance(col("a"), col("b"), 32).as("h32"),
      Dedup.hammingDistance(col("a"), col("b"), 8).as("h8"),
      Dedup.hammingDistance(col("a"), col("b"), 64).as("h64"))
      .collect()(0)
    assert(got.getInt(0) == 4) // xor = 0xF00
    assert(got.getInt(1) == 0) // masked to low 8 bits
    assert(got.getInt(2) == 4)
  }

  test("connectedComponents: chain + triangle + isolated pair label by component min") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 w/ redundant edges, pair 20-21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents throws instead of returning a non-fixpoint labeling") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2)
    }
    // and the same graph converges with enough rounds
    val ok = Dedup.connectedComponents(chain, maxIter = 10).collect()
    assert(ok.forall(_.getLong(1) == 1L))
  }

  test("dropDuplicateClusterMembers keeps component minima and unpaired docs (transitive delete)") {
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // 1-2 and 2-3 near-dup: naive drop-id_b would delete 2,3; clustering must
    // ALSO delete 3 when only (1,2),(2,3) survive banding — and keep 4,5,6
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicateClusterMembers(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 6L))
  }

  test("connectedComponents equals driver-side union-find on arbitrary graphs") {
    import org.scalacheck.{Gen, Prop}
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 25)
      es <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 11L)
        b <- Gen.choose(0L, 11L)
        if a != b
      } yield (a, b))
    } yield es
    PropHelper.check(Prop.forAll(genEdges) { es =>
      val pairs = es.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(pairs, maxIter = 30).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: component representative = min member id
      val members = parent.keys.toSeq.groupBy(find)
      val expected = members.values.flatMap { ms =>
        val m = ms.min; ms.map(_ -> m)
      }.toMap
      got == expected
    }, minTests = 8)
  }

  test("connectedComponentsStar: path of diameter 80 converges in O(log n) rounds") {
    // 81-node chain — the adversarial graph for min-label (needs 80
    // rounds); alternating star contraction must finish inside a log-scale
    // budget and label everything with the chain minimum
    val path = (0L until 80L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsStar(path, maxIter = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 81)
    assert(got.forall(_._2 == 0L))
    // at the same round budget, min-label provably cannot converge
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 12)
    }
  }

  test("connectedComponentsStar equals min-label (and handles self-pairs, empties)") {
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 3) {
      val es = Seq.fill(45)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val pairs = es.toDF("id_a", "id_b")
      val a = Dedup.connectedComponents(
          pairs.filter(col("id_a") =!= col("id_b")), maxIter = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Dedup.connectedComponentsStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // star keeps self-pair-only nodes (labeled themselves); min-label's
      // edge list drops them, so compare on the common node set plus check
      // the self-labeled leftovers
      assert(b.filter { case (id, _) => a.contains(id) } == a)
      assert(b.filter { case (id, _) => !a.contains(id) }.forall { case (id, l) => l == id })
    }
    // empty pair set -> empty labeling, no iteration crash
    assert(Dedup.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).collect().isEmpty)
  }

  test("exact dedup: length-prefixed encoding separates ('a b','c') from ('a','b c') and NULLs") {
    val df = Seq(
      (1L, Some("a b"), Some("c")),
      (2L, Some("a"), Some("b c")),
      (3L, None: Option[String], Some("x")),
      (4L, Some(""), Some("x")),
      (5L, Some("a b"), Some("c"))).toDF("id", "k1", "k2")
    val out = Dedup.exact(df, "id", Seq("k1", "k2")).collect()
    assert(out.length == 4) // rows 1+5 merge; 2,3,4 all distinct
    val dups = out.filter(_.getAs[Long]("dup_count") == 2L)
    assert(dups.length == 1 && dups(0).getAs[Long]("keep_id") == 1L)
  }

  test("lshParameterSweep: closed-form (1,1) areas, best split beats identity") {
    val sweep = Dedup.lshParameterSweep(spark, threshold = 0.35, maxSignature = 16)
      .as[(Int, Int, Double, Double, Double)].collect().toSeq
    assert(sweep.size == 50) // all (b, r) with b*r <= 16
    // (1,1): collision(s) = s. Midpoint integrals over 100 steps:
    // fp = sum_{s_i<0.35} s_i/100 = 0.0612 (35 midpoints), fn = 0.21125
    val id = sweep.find(t => t._1 == 1 && t._2 == 1).get
    assert(math.abs(id._3 - 0.06125) < 1e-6 && math.abs(id._4 - 0.21125) < 1e-6)
    // the sweep is best-first and its winner strictly beats identity
    assert(sweep.head._5 == sweep.map(_._5).min)
    assert(sweep.head._5 < id._5)
    assert(sweep.forall(t => t._3 >= 0 && t._3 <= 1 && t._4 >= 0 && t._4 <= 1))
  }

  test("dupSpans: shared 3-gram spans count, cover, and ratio per doc") {
    val docs = Seq(
      // docs 1 and 2 share the span "one two three" (and only that);
      // doc 3 is clean; doc 4 is shorter than n
      (1L, "one two three four five"),
      (2L, "zero one two three zed"),
      (3L, "alpha beta gamma delta"),
      (4L, "hi")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Int, Long, Long, Double)].collect().toSeq
    // doc 1: span at p=1 covers tokens 1-3 of 5 -> ratio 0.6
    // doc 2: span at p=2 covers tokens 2-4 of 5 -> ratio 0.6
    assert(got == Seq(
      (1L, 5, 1L, 3L, 0.6),
      (2L, 5, 1L, 3L, 0.6),
      (3L, 4, 0L, 0L, 0.0),
      (4L, 1, 0L, 0L, 0.0)))
  }

  test("dupSpans: overlapping repeated spans union their coverage") {
    // both docs share the full 4-token text -> two 3-gram spans each,
    // overlapping; covered must be 4 (union), not 6 (sum)
    val docs = Seq(
      (1L, "a1 b2 c3 d4"), (2L, "a1 b2 c3 d4")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4, 2L, 4L, 1.0), (2L, 4, 2L, 4L, 1.0)))
  }

  test("dupSpans: a span repeated only within ONE doc is not cross-doc duplicated") {
    val docs = Seq(
      (1L, "x y z p q x y z"), // "x y z" twice, same doc
      (2L, "totally different words here")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Int, Long, Long, Double)].collect().toSeq
    assert(got.map(_._3) == Seq(0L, 0L))
  }

  test("removeDupSpans: min-doc keeps the span, later docs lose covered tokens") {
    val docs = Seq(
      (2L, "zero one two three zed"),  // loses "one two three" (keeper is doc 1)
      (1L, "one two three four five"), // keeper: keeps everything
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Int, Long, String)].collect().toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Seq(
      (1L, 5, 5L, m("one two three four five")),
      (2L, 5, 2L, m("zero zed")),
      (3L, 3, 3L, m("alpha beta gamma"))))
  }

  test("removeDupSpans: overlapping drops union; fully-duplicated doc empties") {
    val docs = Seq(
      (5L, "a1 b2 c3 d4"),
      (9L, "a1 b2 c3 d4")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Int, Long, String)].collect().toSeq
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 5 is the keeper for both overlapping 3-grams; doc 9 loses the
    // union of their coverage = all 4 tokens, hashing the empty string
    assert(got == Seq((5L, 4, 4L, m("a1 b2 c3 d4")), (9L, 4, 0L, m(""))))
  }

  test("embeddingNearDupIvf: ordered pairs above threshold, cells within derived nlist") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val nlist = Similarity.adaptiveNlist(emb.count())
    val got = Dedup.embeddingNearDupIvf(emb, "vec_id", "embedding",
        threshold = 0.3)
      .select("cell", "id_a", "id_b", "cosine")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty, "sf0.001 corpus must contain at least one near-dup pair")
    got.foreach { case (c, a, b, cos) =>
      assert(a < b, s"pairs must be ordered, got ($a,$b)")
      assert(cos >= 0.3)
      assert(c >= 0 && c < nlist)
    }
    assert(got.map(p => (p._2, p._3)).distinct.size == got.size, "no duplicate pairs")
  }

  test("containment finds the excerpt Jaccard misses, directionally") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")     // 60 tokens
    val excerpt = (20 to 29).map(i => s"w$i").mkString(" ") // 10-token slice of big
    val other = (100 to 159).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, big), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val m = Dedup.containment(docs, "doc_id", "text",
        n = 4, threshold = 0.6, maxGramDocs = 50)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(m.contains((2L, 1L)), s"excerpt->big missing: $m")
    assert(m((2L, 1L)) == 1.0) // every excerpt gram is in big
    assert(!m.contains((1L, 2L))) // big is NOT contained in the excerpt
    assert(!m.exists { case ((a, b), _) => a == 3L || b == 3L })
    // the Jaccard the excerpt pair would score: 7 shared of 57+7-7 grams —
    // far below any usable threshold, which is why this operator exists
    val jac = 7.0 / 57.0
    assert(jac < 0.2)
  }

  test("containment: the hot-gram cap drops boilerplate from pairing and sizes") {
    // 60 docs share one boilerplate phrase; two docs share unique content
    val boiler = "all rights reserved by the corpus"
    val docs = ((1 to 60).map(i => (i.toLong, s"$boiler doc $i unique tail piece $i here now"))
      :+ (100L, "alpha beta gamma delta epsilon zeta")
      :+ (101L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val got = Dedup.containment(docs, "doc_id", "text",
        n = 4, threshold = 0.9, maxGramDocs = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // boilerplate grams hit 60 docs > cap: those docs never pair on them;
    // the unique-content dup pair survives in both directions
    assert(got == Set((100L, 101L), (101L, 100L)), s"got $got")
  }

  test("clusterRepresentatives: keep-best by priority, ties by id, singletons ride through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src3"), (2L, "src1"), (3L, "src1"),  // cluster A: src1 beats src3, id 2 beats 3
      (4L, "src0"),                              // cluster B alone in clusters frame
      (9L, "src9"))                              // never paired: singleton via coalesce
      .toDF("doc_id", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("id", "cluster_id")
    val prio = substring(col("source"), 4, 8).cast("int")
    val got = Dedup.clusterRepresentatives(clusters, docs, "doc_id", "source", prio)
      .orderBy("cluster_id")
      .as[(Long, Long, String, Int, Long, Long)].collect()
    assert(got(0) == ((1L, 2L, "src1", 1, 3L, 2L)))
    assert(got(1) == ((4L, 4L, "src0", 0, 1L, 0L)))
    assert(got(2) == ((9L, 9L, "src9", 9, 1L, 0L)))
    // the selection is one aggregate — no window sort in the plan
    val plan = Dedup.clusterRepresentatives(clusters, docs, "doc_id", "source", prio)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("clusterRepresentatives: a null/unparseable priority cannot win representative") {
    import spark.implicits._
    // doc 1's source does not parse -> try_cast yields null -> must rank
    // WORST (Int.MaxValue), so the parseable src2 doc wins despite the
    // higher id (a plain ANSI cast would throw; null-producing priority
    // expressions are the try_cast / missing-dim-join shape)
    val docs = Seq((1L, "weird"), (2L, "src2")).toDF("doc_id", "source")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val prio = expr("try_cast(substr(source, 4, 8) AS INT)")
    val got = Dedup.clusterRepresentatives(clusters, docs, "doc_id", "source", prio)
      .select("rep_id", "rep_source", "rep_priority")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((2L, "src2", 2)))
  }

  test("clusterRepresentativesStored equals the recompute form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src3"), (2L, "src1"), (3L, "src1"), (4L, "src0"), (9L, "src9"))
      .toDF("doc_id", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("id", "cluster_id")
    val path = java.nio.file.Files.createTempDirectory("graft_d18").toString + "/clusters"
    clusters.write.mode("overwrite").parquet(path)
    val prio = substring(col("source"), 4, 8).cast("int")
    val direct = Dedup.clusterRepresentatives(clusters, docs, "doc_id", "source", prio)
      .orderBy("cluster_id").collect().toSeq
    val stored = Dedup.clusterRepresentativesStored(spark, path, docs,
        "doc_id", "source", prio)
      .orderBy("cluster_id").collect().toSeq
    assert(stored == direct)
  }

  test("selectLshSplit: deterministic winners whose FP+FN area never exceeds the legacy (4,4) constant") {
    // the splits d03/d12 deploy (budget 32; rows >= 2 falls out of the
    // optimization — single-hash bands would flood the bucket join with
    // near-zero-similarity collisions)
    assert(Dedup.selectLshSplit(spark, threshold = 0.2, maxSignature = 32) == ((16, 2)))
    assert(Dedup.selectLshSplit(spark, threshold = 0.35, maxSignature = 32) == ((10, 3)))
    def err(threshold: Double, budget: Int, b: Int, r: Int): Double =
      Dedup.lshParameterSweep(spark, threshold, budget)
        .filter(col("n_bands") === b && col("n_rows") === r)
        .collect()(0).getAs[Double]("err")
    Seq(0.2, 0.35).foreach { t =>
      val (b, r) = Dedup.selectLshSplit(spark, t, maxSignature = 32)
      assert(err(t, 32, b, r) <= err(t, 32, 4, 4),
        s"selected ($b,$r) must beat the legacy (4,4) at threshold $t")
    }
  }

  test("maintainPairGraph: N incremental batches hash-equal the " +
      "from-scratch build; replays are no-ops; gaps refuse") {
    val docs = Tables.documents(spark, sfDir)
    val graphRoot =
      java.nio.file.Files.createTempDirectory("graft_pg").toString
    val (k, nb, nr, t) = (5, 16, 2, 0.2)
    // three ingest batches partitioned by id residue
    (0 until 3).foreach { i =>
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      Dedup.maintainPairGraph(spark, graphRoot, batch, "doc_id", "text",
        k, nb, nr, t, maxBucketSize = 1000, batchSeq = i + 1L)
    }
    val full = Dedup.minhashLsh(docs, "doc_id", "text", k, nb, nr, t)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    def graph(): Seq[(Long, Long, Double)] =
      graft.operators.TableFormat.read(spark,
          graft.operators.TableFormat.snapshot(spark, s"$graphRoot/pairs"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(full.nonEmpty, "fixture found no near-dup pairs at all")
    assert(graph() == full, "incremental graph diverges from the rebuild")
    // a replayed batch commits nothing (per-table cursors)
    val v = graft.operators.TableFormat
      .snapshot(spark, s"$graphRoot/pairs").version
    val (snap, n) = Dedup.maintainPairGraph(spark, graphRoot,
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), "doc_id", "text",
      k, nb, nr, t, 1000, batchSeq = 3L)
    assert(n == 0L && snap.version == v, "replay must be a no-op")
    assert(graph() == full)
    // a gapped sequence refuses loudly
    val e = intercept[IllegalArgumentException](
      Dedup.maintainPairGraph(spark, graphRoot,
        docs.limit(5), "doc_id", "text", k, nb, nr, t, 1000, batchSeq = 9L))
    assert(e.getMessage.contains("gaps the cursor"), e.getMessage)
  }

  test("maintainPairGraph: the cumulative hot-bucket cap stops a " +
      "degenerate bucket from producing pairs once crossed") {
    val graphRoot =
      java.nio.file.Files.createTempDirectory("graft_pg_hot").toString
    // 12 identical docs in two batches of 6; cap 8 — batch 1's buckets
    // (6 rows each) produce pairs, batch 2's cumulative 12 > 8 stops
    def mk(ids: Range) = ids.map(i =>
        (i.toLong, "the same boilerplate text repeated here verbatim"))
      .toDF("doc_id", "text")
    Dedup.maintainPairGraph(spark, graphRoot, mk(0 until 6), "doc_id",
      "text", 5, 16, 2, 0.2, maxBucketSize = 8, batchSeq = 1L)
    val after1 = graft.operators.TableFormat.read(spark,
      graft.operators.TableFormat.snapshot(spark, s"$graphRoot/pairs")).count()
    assert(after1 > 0, "small bucket must pair")
    val (_, n2) = Dedup.maintainPairGraph(spark, graphRoot, mk(6 until 12),
      "doc_id", "text", 5, 16, 2, 0.2, maxBucketSize = 8, batchSeq = 2L)
    assert(n2 == 0L, s"crossed cap must stop pair production, got $n2")
  }

  test("maintainLabels: incremental label maintenance over batched " +
      "ingest equals the from-scratch CC of the full graph; replays " +
      "are committed no-ops") {
    val docs = Tables.documents(spark, sfDir)
    val graphRoot =
      java.nio.file.Files.createTempDirectory("graft_lb").toString
    (0 until 3).foreach { i =>
      Dedup.maintainPairGraph(spark, graphRoot,
        docs.filter(pmod(col("doc_id"), lit(3)) === i), "doc_id", "text",
        5, 16, 2, 0.2, maxBucketSize = 1000, batchSeq = i + 1L)
      Dedup.maintainLabels(spark, graphRoot)
    }
    val pairs = graft.operators.TableFormat.read(spark,
      graft.operators.TableFormat.snapshot(spark, s"$graphRoot/pairs"))
    val want = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def labels(): Seq[(Long, Long)] =
      graft.operators.TableFormat.read(spark,
          graft.operators.TableFormat.snapshot(spark, s"$graphRoot/labels"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty, "fixture produced no labeled components")
    assert(labels() == want, "maintained labels diverge from the rebuild")
    // the from-scratch labeler agrees too (shared min-id contract)
    assert(want == Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // replay: the pairs cursor is at head, so nothing commits
    val v = graft.operators.TableFormat
      .snapshot(spark, s"$graphRoot/labels").version
    val (snap, remapped, fresh) = Dedup.maintainLabels(spark, graphRoot)
    assert(remapped == 0L && fresh == 0L && snap.version == v,
      s"replay must be a no-op ($remapped, $fresh, ${snap.version} vs $v)")
    assert(labels() == want)
  }

  test("maintainLabels: a disjoint batch appends without touching stored " +
      "label files; a merging batch remaps whole components to the " +
      "global min id") {
    val graphRoot =
      java.nio.file.Files.createTempDirectory("graft_lb2").toString
    val ta = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val tb = "zulu yankee xray whiskey victor uniform tango sierra romeo"
    def mk(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    // batch 1: two components {0,1} (text ta) and {2,3} (text tb)
    Dedup.maintainPairGraph(spark, graphRoot,
      mk(Seq(0L -> ta, 1L -> ta, 2L -> tb, 3L -> tb)),
      "doc_id", "text", 5, 16, 2, 0.2, maxBucketSize = 100, batchSeq = 1L)
    Dedup.maintainLabels(spark, graphRoot)
    def labels(): Map[Long, Long] =
      graft.operators.TableFormat.read(spark,
          graft.operators.TableFormat.snapshot(spark, s"$graphRoot/labels"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels() == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
    val filesAfter1 = graft.operators.TableFormat
      .snapshot(spark, s"$graphRoot/labels").files.map(_.file).toSet
    // batch 2: a DISJOINT component {10,11} — stored files must
    // survive verbatim (no remap, pure append)
    val tc = "lima mike november oscar papa quebec kilo juliett hotel"
    Dedup.maintainPairGraph(spark, graphRoot,
      mk(Seq(10L -> tc, 11L -> tc)),
      "doc_id", "text", 5, 16, 2, 0.2, maxBucketSize = 100, batchSeq = 2L)
    val (_, rm2, fr2) = Dedup.maintainLabels(spark, graphRoot)
    assert(rm2 == 0L && fr2 == 2L, s"disjoint batch: ($rm2, $fr2)")
    val filesAfter2 = graft.operators.TableFormat
      .snapshot(spark, s"$graphRoot/labels").files.map(_.file).toSet
    assert(filesAfter1.subsetOf(filesAfter2),
      "a no-remap batch must not rewrite stored label files")
    assert(labels() == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L,
      10L -> 10L, 11L -> 10L))
    // batch 3: doc 20's text spans ta AND tb — the two components
    // MERGE and every member remaps to the global min (0); the
    // disjoint component {10,11} must not rewrite
    Dedup.maintainPairGraph(spark, graphRoot,
      mk(Seq(20L -> s"$ta $tb")),
      "doc_id", "text", 5, 16, 2, 0.2, maxBucketSize = 100, batchSeq = 3L)
    val (_, rm3, fr3) = Dedup.maintainLabels(spark, graphRoot)
    assert(fr3 == 1L, s"one fresh endpoint expected, got $fr3")
    assert(rm3 >= 2L, s"the {2,3} component must remap, got $rm3")
    assert(labels() == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 0L))
  }
}
