package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Bigram-LM perplexity scoring: hand-computable model on a tiny corpus,
  * the smoothing edge cases, and the ranking property the quality gate
  * depends on (in-domain text scores below gibberish). */
class NgramLmSpec extends SparkTestBase {

  import spark.implicits._

  private def score(rows: Seq[(Long, String)], trainMax: Long) =
    NgramLm.perplexityScore(rows.toDF("doc_id", "text"), "doc_id", "text",
        trainFilter = col("doc_id") <= trainMax)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("hand-computed model: counts, smoothing, and uniform unseen-context fallback") {
    // train = doc 1 only: bigrams (a,b) x2, (b,a) x1; V = |{a, b}| = 2
    val got = score(Seq(
      (1L, "a b a b"),
      (2L, "a b"),    // p(b|a) = (2+1)/(2+2) = 0.75
      (3L, "b b"),    // unseen pair, seen context: p(b|b) = (0+1)/(1+2) = 1/3
      (4L, "z q")),   // unseen context: p = (0+1)/(0+2) = 1/2 = uniform 1/V
      trainMax = 1L)
    assert(got(2L)._1 == 1 && got(2L)._2 == 0)
    assert(math.abs(got(2L)._3 - BigDecimal(-math.log(0.75))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(3L) == ((1L, 1L, BigDecimal(-math.log(1.0 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(4L) == ((1L, 1L, BigDecimal(-math.log(0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // train doc scores itself: 3 bigrams, all seen
    assert(got(1L)._1 == 3 && got(1L)._2 == 0)
  }

  test("documents with fewer than two tokens are absent; output covers the rest") {
    val got = score(Seq((1L, "a b c"), (2L, "solo"), (3L, ""), (4L, "x y")),
      trainMax = 1L)
    assert(got.keySet == Set(1L, 4L))
  }

  test("ranking: in-domain text scores strictly below gibberish under the same model") {
    val train = (1L to 20L).map(i => (i, "the cat sat on the mat and the dog ran"))
    val probe = Seq((100L, "the cat sat on the mat"), (101L, "mat the on ran dog zz"))
    val got = score(train ++ probe, trainMax = 20L)
    assert(got(100L)._3 < got(101L)._3,
      s"fluent ${got(100L)._3} must beat gibberish ${got(101L)._3}")
    assert(got(100L)._2 == 0 && got(101L)._2 > 0) // OOV signal agrees
  }
}
