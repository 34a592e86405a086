package graft

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
}
