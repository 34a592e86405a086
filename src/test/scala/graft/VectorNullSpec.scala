package graft

import org.apache.spark.sql.functions._

import graft.Functions._

/** Vector kernels on malformed input: null elements and length mismatches
  * must produce SQL NULL (the HOF zip_with/aggregate semantics), never a
  * silently truncated or zero-padded result. */
class VectorNullSpec extends SparkTestBase {
  import spark.implicits._

  test("null element => NULL result for dot, cosine, l2_norm") {
    val df = Seq((Seq[Option[Double]](Some(1.0), None, Some(2.0)),
                  Seq[Option[Double]](Some(1.0), Some(1.0), Some(1.0))))
      .toDF("a", "b")
    val row = df.select(
      dot(col("a"), col("b")).as("d"),
      cosine(col("a"), col("b")).as("c"),
      l2_norm(col("a")).as("n")).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2), row.toString)
  }

  test("length mismatch => NULL dot/cosine, not a truncated partial product") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0))).toDF("a", "b")
    val row = df.select(
      dot(col("a"), col("b")).as("d"),
      cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1), row.toString)
  }

  test("well-formed vectors are unaffected") {
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val row = df.select(
      dot(col("a"), col("b")).as("d"),
      cosine(col("a"), col("b")).as("c"),
      l2_norm(col("a")).as("n")).collect()(0)
    assert(row.getDouble(0) == 25.0 && row.getDouble(1) == 1.0 && row.getDouble(2) == 5.0)
  }

  test("jaccard_sorted contract: arbitrary arrays are correct after array_sort(array_distinct)") {
    val df = Seq((Seq(3L, 1L, 2L, 1L), Seq(2L, 3L, 9L))).toDF("a", "b")
    val got = df.select(jaccard_sorted(
      array_sort(array_distinct(col("a"))),
      array_sort(array_distinct(col("b")))).as("j")).collect()(0).getDouble(0)
    assert(got == 2.0 / 4.0) // {1,2,3} vs {2,3,9}
  }
}
