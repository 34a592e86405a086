package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: stable under reruns and repartitioning, correct
  * proportions, total and disjoint split assignment. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.range(20000).select(col("id").as("doc_id"))

  test("sample is identical across reruns and physical layouts") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02, s"got ${a.size}")
  }

  test("growing the fraction only adds rows (nested samples)") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val large = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("assignSplit covers every row exactly once with ~right proportions") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01, counts.toString)
    // same id never changes split
    val again = Sampling.assignSplit(docs.repartition(7), "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val pairs = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    again.select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, s) => assert(pairs(id) == s) }
  }

  test("stratifiedSample: per-stratum fractions, membership independent of other strata") {
    import org.apache.spark.sql.functions._
    val df = spark.range(2000).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, "en").otherwise("de").as("lang"))
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.1))
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // ~500 of 1000 en, ~100 of 1000 de (id-hash is uniform)
    assert(byLang("en") > 400 && byLang("en") < 600, byLang)
    assert(byLang("de") > 50 && byLang("de") < 150, byLang)
    // changing ANOTHER stratum's fraction never flips membership here
    val keptEn = Sampling.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.9))
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(keptEn == kept.filter(_._2 == "en").map(_._1).toSet)
    // a stratum not in the map uses the default fraction
    val all = Sampling.stratifiedSample(df, "doc_id", "lang", Map.empty, defaultFraction = 1.0)
    assert(all.count() == 2000)
  }

  test("rebalanceToTarget hits the target mix, keeps the binding stratum whole") {
    // 1500 a / 900 b / 600 c; targets 0.2/0.3/0.5 -> binding stratum is c
    // (600/0.5 = 1200 = min scale): keep all 600 c, ~240 a, ~360 b
    val df = spark.range(3000).select(col("id").as("doc_id"),
      when(col("id") < 1500, "a").when(col("id") < 2400, "b").otherwise("c").as("src"))
    val kept = Sampling.rebalanceToTarget(df, "doc_id", "src",
        Seq("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
      .select("doc_id", "src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("c") == 600, bySrc) // binding stratum: kept 100%
    assert(bySrc("a") > 190 && bySrc("a") < 290, bySrc)
    assert(bySrc("b") > 300 && bySrc("b") < 420, bySrc)
    // membership is the same deterministic id-hash decision on rerun
    val again = Sampling.rebalanceToTarget(df.repartition(7), "doc_id", "src",
        Seq("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("rebalanceToTarget drops strata absent from the targets and validates input") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, "keep").otherwise("drop").as("src"))
    val kept = Sampling.rebalanceToTarget(df, "doc_id", "src", Seq("keep" -> 1.0))
    assert(kept.select("src").distinct().as[String].collect().toSeq == Seq("keep"))
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTarget(df, "doc_id", "src", Seq("keep" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTarget(df, "doc_id", "src",
        Seq("keep" -> 1.5, "drop" -> -0.5))
    }
  }

  test("weights must sum to one; fraction must be in range") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(docs, "doc_id", 1.5)
    }
  }

  private def naiveBudgetPrefix(rows: Seq[(Long, Double, Long)],
                                budget: Long): Set[Long] = {
    val ordered = rows.sortBy { case (id, s, _) => (-s, id) }
    var cum = 0L
    ordered.flatMap { case (id, _, t) =>
      cum += t
      if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("tokenBudgetSelect equals the naive greedy prefix on random corpora") {
    val rnd = new scala.util.Random(26)
    for (trial <- 1 to 4) {
      // mix of continuous scores, massive tie groups (the boundary-bucket
      // hard case), zero-token rows, and rows straddling bucket edges
      val rows = Seq.tabulate(600) { i =>
        val score =
          if (i % 3 == 0) 0.5                        // one huge tie group
          else rnd.nextInt(1001) / 1000.0            // exactly on bucket edges
        val toks = if (i % 41 == 0) 0L else rnd.nextInt(200).toLong
        (i.toLong, score, toks)
      }
      val total = rows.map(_._3).sum
      val budget = (total * (trial * 0.22)).toLong
      val got = Sampling.tokenBudgetSelect(
          rows.toDF("doc_id", "score", "n_toks"),
          "doc_id", "score", "n_toks", budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got == naiveBudgetPrefix(rows, budget),
        s"trial $trial (budget $budget): ${got.size} vs naive ${naiveBudgetPrefix(rows, budget).size}")
    }
  }

  test("tokenBudgetSelect: whole corpus fits; zero budget keeps only zero-token leaders") {
    val rows = Seq((1L, 0.9, 5L), (2L, 0.8, 5L), (3L, 0.9, 0L))
    val df = rows.toDF("doc_id", "score", "n_toks")
    assert(Sampling.tokenBudgetSelect(df, "doc_id", "score", "n_toks", 100L)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // budget 0: prefix is (1, 3) by (score desc, id); doc 3 has 0 tokens but
    // follows doc 1 (5 tokens) in the order, so cum is already over — only a
    // zero-token row that LEADS its order prefix survives
    assert(Sampling.tokenBudgetSelect(df, "doc_id", "score", "n_toks", 0L)
      .select("doc_id").as[Long].collect().toSet ==
      naiveBudgetPrefix(rows, 0L))
  }

  /** JVM replay of hashFraction: md5 of the id string, first 12 hex chars
    * as a long, mod 1e6, over 1e6 — the exact Spark/DuckDB arithmetic. */
  private def hashU(id: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0
  }

  test("weightedSample equals the driver-side A-Res replay") {
    val rows = Seq.tabulate(2000)(i => (i.toLong, if (i % 2 == 0) 8.0 else 1.0))
    val k = 300
    val got = Sampling.weightedSample(
        rows.toDF("doc_id", "w").repartition(7), "doc_id", col("w"), k)
      .select("doc_id").as[Long].collect().toSet
    val expected = rows
      .map { case (id, w) => (id, math.pow(hashU(id), 1.0 / w)) }
      .sortBy { case (id, key) => (-key, id) }
      .take(k).map(_._1).toSet
    assert(got == expected)
    // inclusion scales with weight: the 8x stratum dominates the draw
    val heavy = expected.count(_ % 2 == 0)
    assert(heavy > 2 * (k - heavy), s"heavy=$heavy of $k")
  }

  test("weightedSample excludes null and non-positive weights, validates k") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(0.0)), (4L, Some(-2.0)))
      .toDF("doc_id", "w")
    assert(Sampling.weightedSample(df, "doc_id", col("w"), 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "doc_id", col("w"), -1)
    }
  }

  test("tokenBudgetSelect excludes null/negative inputs and validates args") {
    val df = Seq(
      (1L, Some(0.9), Some(10L)), (2L, None, Some(10L)),
      (3L, Some(0.8), None), (4L, Some(0.7), Some(-5L)), (5L, Some(0.6), Some(10L)))
      .toDF("doc_id", "score", "n_toks")
    assert(Sampling.tokenBudgetSelect(df, "doc_id", "score", "n_toks", 1000L)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(df, "doc_id", "score", "n_toks", -1L)
    }
  }
}
