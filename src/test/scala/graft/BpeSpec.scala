package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge training on hand-computable fixtures. The part worth pinning
  * hard is LTR non-overlap on same-symbol chains ("a a a a" + merge (a,a)
  * must give "aa aa", never an overlapping triple) and the deterministic
  * frequency/lexicographic tie-break. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("wordTable lowercases, strips non-letters, splits to char symbols") {
    val docs = Seq("Low low-low!  ox", "ox?").toDF("text")
    val m = Bpe.wordTable(docs, "text")
      .select(col("word"), col("freq"), concat_ws(" ", col("syms")))
      .as[(String, Long, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("low") == ((3L, "l o w")))
    assert(m("ox") == ((2L, "o x")))
    assert(m.size == 2)
  }

  test("selects the most frequent pair; ties break lexicographically") {
    // "ab" x3 -> pair (a,b) freq 3; "cd" x3 -> (c,d) freq 3: tie -> (a,b)
    val docs = Seq("ab ab ab cd cd cd").toDF("text")
    val got = Bpe.trainMerges(docs, "text", 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 3L), (2, "c", "d", 3L)))
  }

  test("same-symbol chains merge left-to-right non-overlapping") {
    // "aaaa" x2: pairs (a,a) freq = 3 per word x2 = 6; after merge (a,a)
    // the word must segment as [aa, aa] (LTR), giving next pair (aa,aa)
    val docs = Seq("aaaa aaaa").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
    // odd-length chain: "aaa" -> [aa, a] (the trailing single survives)
    val seg = Bpe.segment(Bpe.wordTable(Seq("aaa").toDF("text"), "text"),
        Seq(("a", "a")))
      .select(concat_ws(" ", col("syms"))).as[String].head()
    assert(seg == "aa a")
  }

  test("merges compound across rounds into multi-char symbols") {
    // classic: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    // BPE walkthrough corpus (Sennrich et al. §3.2 shape). Round 1 pair
    // stats: (e,s) 9, (s,t) 9, (t,_) 0... we just pin the first merges
    // and that a merged symbol participates in later pairs.
    val docs = Seq(Array.fill(5)("low").mkString(" "),
      Array.fill(2)("lower").mkString(" "),
      Array.fill(6)("newest").mkString(" "),
      Array.fill(3)("widest").mkString(" ")).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 3)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    // (e,s) and (s,t) both appear in newest+widest = 9; tie-break (e,s) first,
    // then (es,t) 9 fuses the new symbol, then (est ...) vs (l,o) 7 vs ...
    assert(merges(0) == ((1, "e", "s", 9L)))
    assert(merges(1) == ((2, "es", "t", 9L)))
    assert(merges(2)._2 == "l") // (l,o): low(5)+lower(2) = 7
    assert(merges(2)._3 == "o" && merges(2)._4 == 7L)
  }

  test("segment applies a trained model and preserves frequencies") {
    val docs = Seq("hug hug pug").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val seg = Bpe.segment(words, Seq(("u", "g"), ("h", "ug")))
      .select(col("word"), col("freq"), concat_ws(" ", col("syms")))
      .as[(String, Long, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(seg("hug") == ((2L, "hug")))
    assert(seg("pug") == ((1L, "p ug")))
  }

  test("property: segmentLocal == segment on random corpora and merge lists") {
    import org.scalacheck.{Gen, Prop}
    // small alphabet maximizes chain/overlap collisions — the hard cases
    val word = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
    val sym = Gen.oneOf("a", "b", "c", "aa", "ab", "ba", "bc", "cc")
    val mergeList = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(sym, sym)))
    PropHelper.check(Prop.forAll(corpus, mergeList) { (ws, ms) =>
      val words = Bpe.wordTable(Seq(ws.mkString(" ")).toDF("text"), "text")
      val render = (df: org.apache.spark.sql.DataFrame) => df
        .select(col("word"), col("freq"), concat_ws(" ", col("syms")))
        .as[(String, Long, String)].collect().toSet
      render(Bpe.segmentLocal(words, ms)) == render(Bpe.segment(words, ms))
    }, minTests = 30) // each case runs 2 Spark plans; 30 covers the space
  }

  test("segmentLocal equals the window-algebra segment, chains included") {
    // same-symbol chains + compounding merges — the cases where LTR
    // non-overlap semantics could diverge between the two implementations
    val docs = Seq("aaaa aaa abab hug pug banana").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val merges = Seq(("a", "a"), ("aa", "aa"), ("u", "g"), ("h", "ug"),
      ("a", "b"), ("ab", "ab"), ("a", "n"))
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select(col("word"), col("freq"), concat_ws(" ", col("syms")))
      .as[(String, Long, String)].collect().toSet
    assert(render(Bpe.segmentLocal(words, merges)) ==
      render(Bpe.segment(words, merges)))
    // and the local form pins the hand-derived chain results
    val local = render(Bpe.segmentLocal(words, merges)).map(t => t._1 -> t._3).toMap
    assert(local("aaaa") == "aaaa")  // (a,a) -> aa aa; (aa,aa) -> aaaa
    assert(local("aaa") == "aa a")   // odd chain leaves the trailing single
    assert(local("abab") == "abab")  // (a,b) -> ab ab; (ab,ab) -> abab
    assert(local("banana") == "b an an a")
  }
}
