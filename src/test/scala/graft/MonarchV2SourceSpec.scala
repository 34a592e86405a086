package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DataSourceV2 pushdown source: filters/columns/limit must reach the reader
  * (visible in the physical plan) and results must match a plain-Spark
  * evaluation of the same predicates. */
class MonarchV2SourceSpec extends SparkTestBase {

  private lazy val dataDir: String = {
    val dir = Files.createTempDirectory("graft_v2").toString
    val rows = (1 to 500).map { i =>
      val date = f"2026-01-${i % 28 + 1}%02d"
      val cat = Seq("food", "rent", "fun")(i % 3)
      val amount = (i * 7 % 500) - 100 + 0.25
      s"""{"id":"$i","date":"$date","amount":$amount,"account_id":"A${i % 5}","category":"$cat","merchant":"M${i % 11}","pending":${i % 97 == 0}}"""
    }
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      rows.take(250).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-1.jsonl"),
      rows.drop(250).mkString("\n"))
    dir
  }

  private def read() = spark.read.format("monarch-txns").load(dataDir)

  test("source registers by short name and reads all rows/columns") {
    val df = read()
    assert(df.count() == 500)
    assert(df.columns.toSeq ==
      Seq("id", "date", "amount", "account_id", "category", "merchant", "pending"))
  }

  test("filters are pushed into the reader and results match plain evaluation") {
    val df = read()
      .filter(col("date") >= lit("2026-01-10").cast("date"))
      .filter(col("category").isin("food", "rent"))
      .filter(col("amount") > 50.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(date"),
      s"filters not pushed:\n$plan")
    // independent check through Spark's own JSON reader
    val expected = spark.read.schema(
        graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .filter(col("date") >= lit("2026-01-10").cast("date"))
      .filter(col("category").isin("food", "rent"))
      .filter(col("amount") > 50.0)
    assert(df.count() == expected.count() && df.count() > 0)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      expected.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = read().select("id", "amount")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:string,amount:double>"), plan)
    assert(df.collect().length == 500)
  }

  test("pushed date filters work under spark.sql.datetime.java8API (LocalDate literals)") {
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try {
      val df = read().filter(col("date") >= lit("2026-01-10").cast("date"))
      val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
        .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
        .filter(col("date") >= lit("2026-01-10").cast("date"))
      assert(df.count() == expected.count() && df.count() > 0)
    } finally spark.conf.set("spark.sql.datetime.java8API.enabled", "false")
  }

  test("null-bearing In-lists are NOT pushed (Spark keeps its null semantics)") {
    val df = read().filter(col("category").isin("food", null))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [In(category"), plan)
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .filter(col("category").isin("food", null))
    assert(df.count() == expected.count())
  }

  test("global count/min/max/sum push into the reader as partial aggregates") {
    import spark.implicits._
    val df = read()
      .filter(col("category") === "food")
      .agg(count(lit(1)).as("n"), count(col("merchant")).as("nm"),
        min(col("date")).as("dmin"), max(col("amount")).as("amax"),
        sum(col("amount")).as("asum"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [CountStarCall"), s"aggregates not pushed:\n$plan")
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .filter(col("category") === "food")
      .agg(count(lit(1)), count(col("merchant")), min(col("date")),
        max(col("amount")), sum(col("amount")))
      .as[(Long, Long, java.sql.Date, Double, Double)].head()
    val got = df.as[(Long, Long, java.sql.Date, Double, Double)].head()
    assert(got == expected)
  }

  test("grouped aggregates push with their keys; unsupported ones stay Spark-side") {
    val grouped = read().groupBy("category")
      .agg(sum(col("amount")).as("s"), count(lit(1)).as("n"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedGroupBy: [category]"), s"group-by not pushed:\n$plan")
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .groupBy("category").agg(sum(col("amount")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val got = grouped.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (s, n)) =>
      assert(n == expected(k)._2 && math.abs(s - expected(k)._1) < 1e-6)
    }
    // avg pushes via Spark's own SUM/COUNT rewrite and stays exact
    val avgDf = read().agg(avg(col("amount")))
    assert(avgDf.queryExecution.executedPlan.toString
      .contains("PushedAggregates: [SumCall(amount), CountCall(amount)]"))
    val avg1 = avgDf.collect()(0).getDouble(0)
    val avg2 = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .agg(avg(col("amount"))).collect()(0).getDouble(0)
    assert(math.abs(avg1 - avg2) < 1e-6)
    // distinct aggregation is rejected -> full rows flow, result still right
    val sd = read().agg(sum_distinct(col("amount")))
    assert(!sd.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val sd2 = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .agg(sum_distinct(col("amount"))).collect()(0).getDouble(0)
    assert(math.abs(sd.collect()(0).getDouble(0) - sd2) < 1e-6)
  }

  test("distinct() plans and computes correctly (group-by-only aggregation)") {
    // Spark declines to PARTIAL-push an aggregation with no aggregate
    // functions (nothing to split into partial/final), so this must simply
    // plan as a plain pruned scan — the source accepting the pushAggregation
    // probe but reporting the row schema used to crash planning here
    val df = read().select("category").distinct()
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("food", "fun", "rent"))
  }

  test("group-by on the unique id column is rejected (unbounded reader state)") {
    val df = read().groupBy("id").agg(count(lit(1)).as("n"))
    assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(df.count() == 500)
  }

  test("pushed string min/max uses UTF-8 binary order (supplementary chars)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_v2_utf").toString
    // U+FFFD is a single UTF-16 unit above the surrogate range; U+1F600 is a
    // surrogate pair — java.lang.String order inverts them vs UTF-8 bytes
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      s"""{"id":"1","date":"2026-01-01","amount":1.0,"account_id":"A","category":"c","merchant":"�","pending":false}
         |{"id":"2","date":"2026-01-02","amount":2.0,"account_id":"A","category":"c","merchant":"😀","pending":false}""".stripMargin)
    val df = spark.read.format("monarch-txns").load(dir)
      .agg(min(col("merchant")).as("mn"), max(col("merchant")).as("mx"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(s"$dir/part-0.jsonl")
      .agg(min(col("merchant")), max(col("merchant")))
      .as[(String, String)].head()
    assert(df.as[(String, String)].head() == expected)
  }

  test("ordered pagination pushes TopN + offset: no Sort/Limit/Offset above the scan") {
    val df = read()
      .orderBy(col("date"), col("id"))
      .offset(100).limit(25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [date ASC NULLS FIRST, id ASC NULLS FIRST]"),
      s"TopN not pushed:\n$plan")
    assert(plan.contains("PushedOffset: 100"), s"offset not pushed:\n$plan")
    // the pagination executes INSIDE the scan: nothing re-sorts or
    // re-skips above it
    assert(!plan.contains("Sort ") && !plan.contains("TakeOrdered") &&
      !plan.contains("GlobalLimit") && !plan.contains("CollectLimit"),
      s"residual sort/limit machinery:\n$plan")
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .orderBy(col("date"), col("id"))
      .offset(100).limit(25)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSeq
    val got = df.collect().map(r => (r.getString(0), r.getDate(1).toString)).toSeq
    assert(got == expected, s"page mismatch: $got vs $expected")
  }

  test("TopN pushdown respects direction and filters; bare offset is rejected") {
    val df = read()
      .filter(col("category") === "food")
      .orderBy(col("amount").desc, col("id"))
      .limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [amount DESC NULLS LAST, id ASC NULLS FIRST]"),
      s"TopN not pushed:\n$plan")
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .filter(col("category") === "food")
      .orderBy(col("amount").desc, col("id"))
      .limit(5).collect().map(_.getString(0)).toSeq
    assert(df.collect().map(_.getString(0)).toSeq == expected)
    // an offset with no ordering is nondeterministic -> stays in Spark,
    // result count still correct
    val bare = read().offset(490)
    assert(!bare.queryExecution.executedPlan.toString.contains("PushedOffset"))
    assert(bare.count() == 10)
  }

  test("TopN with pruned projection still sorts on non-projected keys") {
    // sort keys (date, id) are evaluated in the reader even though the
    // projection keeps only amount — pruning cannot break the ordering
    val df = read()
      .orderBy(col("date"), col("id"))
      .offset(10).limit(3)
      .select("amount")
    val expected = spark.read.schema(graft.sources.v2.MonarchTransactionsV2.schema)
      .json(dataDir + "/part-0.jsonl", dataDir + "/part-1.jsonl")
      .orderBy(col("date"), col("id"))
      .offset(10).limit(3)
      .select("amount").collect().map(_.getDouble(0)).sorted.toSeq
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == expected)
  }

  test("limit pushes down and unsupported predicates stay Spark-side") {
    val limited = read().limit(7)
    assert(limited.queryExecution.executedPlan.toString.contains("Limit: 7"))
    assert(limited.count() == 7)
    // contains() is not expressible in the pushdown set -> Spark post-filter
    val df = read().filter(col("merchant").contains("M1"))
    val expectedIds = (1 to 500).filter(i => s"M${i % 11}".contains("M1")).map(_.toString).sorted
    assert(df.collect().map(_.getString(0)).sorted.toSeq == expectedIds)
  }
}
