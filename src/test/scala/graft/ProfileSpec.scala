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
}
