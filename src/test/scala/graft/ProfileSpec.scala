package graft

import org.apache.spark.sql.functions.col

import graft.operators.Profile

/** ANALYZE-style table profiling: null/distinct accounting and the
  * one-row-per-column shape. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts nulls and distincts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")),
      (None, Some("b"))
    ).toDF("k", "v")
    val got = Profile.profile(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("k", 3L, 1L, 2L, "1", "2"),
      ("v", 3L, 1L, 2L, "a", "b")))
  }

  test("profile of an empty frame reports zeros and null extrema") {
    val df = Seq.empty[(Option[Long], Option[String])].toDF("k", "v")
    val got = Profile.profile(df, Seq("k"))
      .select("n_nonnull", "n_null", "n_distinct").as[(Long, Long, Long)].head()
    assert(got == ((0L, 0L, 0L)))
  }

  test("profile requires at least one column") {
    intercept[IllegalArgumentException] { Profile.profile(spark.range(1).toDF(), Nil) }
  }

  test("histogram: equi-width bins, max closes into the last bin, nulls excluded") {
    val df = Seq(Some(0.0), Some(1.0), Some(2.5), Some(9.9), Some(10.0), None)
      .toDF("v")
    val got = Profile.histogram(df, "v", bins = 5)
      .as[(Int, Double, Double, Long)].collect().toSeq
    // range [0,10], width 2: 0,1 -> bin 0; 2.5 -> bin 1; 9.9, 10.0 -> bin 4
    assert(got == Seq((0, 0.0, 2.0, 2L), (1, 2.0, 4.0, 1L), (4, 8.0, 10.0, 2L)))
  }

  test("histogram of a constant column collapses into bin 0") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val got = Profile.histogram(df, "v", bins = 4)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(got == Seq((0, 7.0, 7.0, 3L)))
  }

  test("histogram of an all-null or empty column emits nothing") {
    val df = Seq.empty[Option[Double]].toDF("v")
    assert(Profile.histogram(df, "v", bins = 3).isEmpty)
  }

  private def naiveQuantiles(vs: Seq[Long], qBp: Seq[Int]): Seq[(Long, Long, Long, Long)] = {
    val sorted = vs.sorted
    val n = vs.size.toLong
    qBp.sorted.distinct.map { q =>
      val rk = (q.toLong * n + 9999L) / 10000L
      (q.toLong, rk, sorted((rk - 1).toInt), n)
    }
  }

  test("exactQuantiles matches the naive sorted-rank answer, ties included") {
    val rnd = new scala.util.Random(66)
    val vs = Seq.fill(3000)(rnd.nextInt(200).toLong - 100) // heavy duplicates
    val qs = Seq(1, 2500, 5000, 7500, 9900, 10000)
    val got = Profile.exactQuantiles(vs.toDF("v"), "v", qs, granularity = 37)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == naiveQuantiles(vs, qs))
  }

  test("exactQuantiles is granularity-invariant (1 bucket to 1 per value)") {
    val rnd = new scala.util.Random(67)
    val vs = Seq.fill(500)(rnd.nextLong() % 1000000)
    val qs = Seq(500, 5000, 9500)
    val expected = naiveQuantiles(vs, qs)
    for (g <- Seq(1, 10, 1000000)) {
      val got = Profile.exactQuantiles(vs.toDF("v"), "v", qs, granularity = g)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"granularity=$g")
    }
  }

  test("exactQuantiles: constant column, nulls excluded, empty input") {
    val const = Profile.exactQuantiles(Seq(5L, 5L, 5L).toDF("v"), "v", Seq(5000))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(const == Seq((5000L, 2L, 5L, 3L)))
    val withNulls = Profile.exactQuantiles(
        Seq(Some(1L), None, Some(3L), None).toDF("v"), "v", Seq(10000))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(withNulls == Seq((10000L, 2L, 3L, 2L))) // nulls neither rank nor count
    assert(Profile.exactQuantiles(
      Seq.empty[Option[Long]].toDF("v"), "v", Seq(5000)).isEmpty)
  }

  test("driftPsi matches a driver-side replay and sums near zero for identical slices") {
    val rnd = new scala.util.Random(68)
    val rows = Seq.fill(4000)((rnd.nextGaussian() * 10 + 50, rnd.nextBoolean()))
    val bins = 10
    val got = Profile.driftPsi(rows.toDF("v", "b"), "v", col("b"), bins)
      .as[(Int, Long, Long, Double)].collect().toSeq
    // driver replay with identical arithmetic
    val vs = rows.map(_._1)
    val (mn, mx) = (vs.min, vs.max)
    val width = (mx - mn) / bins
    def binOf(v: Double) = math.min(math.floor((v - mn) / width), bins - 1).toInt
    val byBin = rows.groupBy(r => binOf(r._1))
    val tb = rows.count(_._2).toDouble
    val tc = rows.size - tb
    val expected = byBin.toSeq.sortBy(_._1).map { case (b, rs) =>
      val nb = rs.count(_._2).toLong
      val nc = rs.size - nb
      val p = math.max(nb / tb, 1e-4)
      val q = math.max(nc / tc, 1e-4)
      (b, nb, nc, BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expected)
    // two draws from the same distribution: total PSI is tiny
    assert(math.abs(got.map(_._4).sum) < 0.05)
  }

  test("driftPsi: a shifted slice drifts, an empty bin stays finite") {
    val base = Seq.tabulate(1000)(i => (i % 100 * 1.0, true))
    val curr = Seq.tabulate(1000)(i => (i % 100 * 1.0 + 150, false)) // disjoint range
    val got = Profile.driftPsi((base ++ curr).toDF("v", "b"), "v", col("b"), 5)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got.forall(r => !r._4.isInfinite && !r._4.isNaN))
    assert(got.map(_._4).sum > 0.25, s"disjoint slices must read as drifted: $got")
  }

  test("driftPsi validates its arguments") {
    val df = Seq((1.0, true)).toDF("v", "b")
    intercept[IllegalArgumentException] { Profile.driftPsi(df, "v", col("b"), 0) }
    intercept[IllegalArgumentException] {
      Profile.driftPsi(df, "v", col("b"), 5, probFloor = 0.0)
    }
  }

  test("exactQuantiles validates its arguments") {
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] { Profile.exactQuantiles(df, "v", Nil) }
    intercept[IllegalArgumentException] { Profile.exactQuantiles(df, "v", Seq(0)) }
    intercept[IllegalArgumentException] { Profile.exactQuantiles(df, "v", Seq(10001)) }
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(df, "v", Seq(5000), granularity = 0)
    }
  }
}
