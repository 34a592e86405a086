package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed joins must be exchange-free and row-identical to plain joins. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("same-bucketed tables join without any shuffle exchange") {
    val fact = (1 to 5000).map(i => (i % 400, s"f$i", i * 1.5)).toDF("key", "tag", "v")
    val dim = (0 until 400).map(k => (k, s"name_$k")).toDF("key", "name")
    Bucketing.writeBucketed(fact, "bkt_fact", "key", 8)
    Bucketing.writeBucketed(dim, "bkt_dim", "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val joined = Bucketing.coLocatedJoin(spark, "bkt_fact", "bkt_dim", "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // row-identical to the plain join
      val got = joined.select("key", "tag", "name").collect().map(_.toSeq.mkString("|")).sorted
      val expected = fact.join(dim, Seq("key"))
        .select("key", "tag", "name").collect().map(_.toSeq.mkString("|")).sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }
}
