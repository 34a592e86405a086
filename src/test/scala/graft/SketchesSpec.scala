package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count-Min Sketch invariants: one-sided error (est >= true, always),
  * exactness when buckets don't collide, the degenerate width-1 bound, and
  * additive mergeability. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def occurrences(pairs: (String, Int)*) =
    pairs.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("key")

  private def estimates(items: org.apache.spark.sql.DataFrame,
                        width: Int, depth: Int): Map[String, Long] = {
    val cms = Sketches.countMinBuild(items, "key", width, depth)
    val cand = items.select("key").distinct()
    Sketches.countMinEstimate(cms, cand, "key", width, depth)
      .as[(String, Long)].collect().toMap
  }

  test("est >= true always; exact at generous width") {
    val items = occurrences("alpha" -> 5, "beta" -> 3, "gamma" -> 1, "delta" -> 7)
    val truth = Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L, "delta" -> 7L)
    val est = estimates(items, width = 1024, depth = 4)
    truth.foreach { case (k, t) => assert(est(k) >= t, s"$k under-counted") }
    // 4 keys in 1024 buckets x 4 depths: a collision in EVERY depth row is
    // practically impossible — estimates are exact
    assert(est == truth)
  }

  test("width=1 collapses every estimate to the total count") {
    val items = occurrences("a" -> 2, "b" -> 3, "c" -> 5)
    val est = estimates(items, width = 1, depth = 3)
    assert(est.values.toSet == Set(10L))
  }

  test("sketches over disjoint inputs merge by summing counters") {
    val part1 = occurrences("x" -> 4, "y" -> 1)
    val part2 = occurrences("x" -> 2, "z" -> 6)
    val (w, d) = (256, 4)
    val merged = Sketches.countMinBuild(part1, "key", w, d)
      .unionByName(Sketches.countMinBuild(part2, "key", w, d))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMinBuild(part1.unionByName(part2), "key", w, d)
    // identical tables: CMS is a linear sketch
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Long, Long)].collect().toSet)
    val cand = Seq("x", "y", "z").toDF("key")
    val est = Sketches.countMinEstimate(merged, cand, "key", w, d)
      .as[(String, Long)].collect().toMap
    assert(est == Map("x" -> 6L, "y" -> 1L, "z" -> 6L))
  }
}
