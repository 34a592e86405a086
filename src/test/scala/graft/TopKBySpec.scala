package graft

import org.apache.spark.sql.functions._

import graft.Functions._
import graft.operators.Windows

/** Bounded-heap per-group top-k: deterministic under ties, correct across
  * forced partial-aggregation merges, and equal to the window formulation. */
class TopKBySpec extends SparkTestBase {
  import spark.implicits._

  test("keeps the k best by (ord DESC, tie ASC); ties break on tie ASC") {
    val df = Seq(
      ("g", 5.0, 1L, "a"), ("g", 5.0, 2L, "b"), ("g", 5.0, 3L, "c"),
      ("g", 9.0, 9L, "top"), ("g", 1.0, 0L, "low")).toDF("g", "v", "id", "p")
    val got = df.groupBy("g").agg(top_k_by(col("p"), col("v"), col("id"), 3).as("t"))
      .select("t").as[Seq[String]].collect()(0)
    assert(got == Seq("top", "a", "b"))
  }

  test("string ties order lexicographically and survive partial-merge serialization") {
    val df = spark.range(1000)
      .select(
        (col("id") % 4).as("g"),
        (col("id") % 10).cast("double").as("v"),
        concat(lit("t"), lpad((col("id") % 50).cast("string"), 3, "0")).as("tie"))
      .repartition(8) // force serialize/deserialize through partial merges
    val viaAgg = df.groupBy("g")
      .agg(top_k_by(col("tie"), col("v"), col("tie"), 5).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select("g", "pos", "col").as[(Long, Int, String)].collect().toSeq.sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("tie").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("tie"))
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(viaAgg == viaWindow)
  }

  test("an array-typed tie is rejected") {
    val df = Seq(("g", 1.0, Seq(1L), "x")).toDF("g", "v", "tie", "p")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(top_k_by(col("p"), col("v"), col("tie"), 2).as("t")).collect()
    }
    assert(e.getMessage.contains("tie must be an atomic orderable type"))
  }

  test("k larger than the group returns the whole group ordered") {
    val df = Seq(("g", 1.0, 1L, "x"), ("g", 2.0, 2L, "y")).toDF("g", "v", "id", "p")
    val got = df.groupBy("g").agg(top_k_by(col("p"), col("v"), col("id"), 10).as("t"))
      .select("t").as[Seq[String]].collect()(0)
    assert(got == Seq("y", "x"))
  }

  test("partial merges across many partitions match the window formulation") {
    val n = 10000
    val df = spark.range(n)
      .select(
        (col("id") % 7).as("g"),
        (pmod(col("id") * 37, lit(1000))).cast("double").as("v"),
        col("id"))
      .repartition(16) // force per-partition partials + merge
    val viaAgg = Windows.topKPerGroup(df, Seq("g"), "id", "v", "id", 5)
      .orderBy("g", "rank")
      .select("g", "rank", "id").as[(Long, Int, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("g", "rank")
      .select("g", "rank", "id").as[(Long, Int, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("null ord/tie/payload rows are skipped, not ranked") {
    val df = Seq(
      (Some(1.0), Some(1L), Some("a")),
      (None: Option[Double], Some(2L), Some("b")),
      (Some(3.0), None: Option[Long], Some("c")),
      (Some(4.0), Some(4L), None: Option[String])).toDF("v", "id", "p")
    val got = df.agg(top_k_by(col("p"), col("v"), col("id"), 10).as("t"))
      .select("t").as[Seq[String]].collect()(0)
    assert(got == Seq("a"))
  }

  test("callable from SQL and uses ObjectHashAggregate (no sort-based fallback)") {
    Seq(("g", 1.0, 1L, "x"), ("g", 2.0, 2L, "y")).toDF("g", "v", "id", "p")
      .createOrReplaceTempView("topk_t")
    val df = spark.sql("SELECT g, top_k_by(p, v, id, 1) AS t FROM topk_t GROUP BY g")
    assert(df.select("t").as[Seq[String]].collect()(0) == Seq("y"))
    assert(df.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
  }
}
