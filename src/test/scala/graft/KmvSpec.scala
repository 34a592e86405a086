package graft

import org.apache.spark.sql.functions._

import graft.Functions._

/** KMV distinct sketch: exact below k, accurate and partition-invariant
  * above, mergeable through partial aggregation. */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("below k distinct values the sketch is exact") {
    val df = (1 to 100).map(i => s"v${i % 7}").toDF("s")
    val est = df.agg(kmv_distinct(col("s"), 16)).collect()(0).getDouble(0)
    assert(est == 7.0)
  }

  test("estimate is within 25% of truth for 10k distinct values at k=256") {
    val df = spark.range(10000).select(concat(lit("id_"), col("id")).as("s"))
    val est = df.agg(kmv_distinct(col("s"), 256)).collect()(0).getDouble(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"est=$est")
  }

  test("partition-invariant: the same estimate from any physical layout") {
    val base = spark.range(5000).select(concat(lit("x"), col("id")).as("s"))
    val e1 = base.coalesce(1).agg(kmv_distinct(col("s"), 64)).collect()(0).getDouble(0)
    val e2 = base.repartition(13).agg(kmv_distinct(col("s"), 64)).collect()(0).getDouble(0)
    assert(e1 == e2)
  }

  test("duplicates never inflate the estimate") {
    val once = spark.range(1000).select(concat(lit("d"), col("id")).as("s"))
    val tripled = once.union(once).union(once)
    val e1 = once.agg(kmv_distinct(col("s"), 64)).collect()(0).getDouble(0)
    val e3 = tripled.agg(kmv_distinct(col("s"), 64)).collect()(0).getDouble(0)
    assert(e1 == e3)
  }

  test("callable from SQL; nulls are skipped") {
    Seq(Some("a"), Some("b"), None, Some("a")).toDF("s").createOrReplaceTempView("kmv_t")
    val est = spark.sql("SELECT kmv_distinct(s, 8) FROM kmv_t").collect()(0).getDouble(0)
    assert(est == 2.0)
  }
}
