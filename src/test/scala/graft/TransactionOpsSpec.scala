package graft

import org.apache.spark.sql.functions._

import graft.operators.TransactionOps

/** S2/P2/O1/O4/A1/A8 — filtered/ordered/paginated scan semantics
  * (monarchmoney.py:1403-1554, 1367-1401). */
class TransactionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("t1", "2026-01-01", 100.0, "food", true),
    ("t2", "2026-01-02", -50.0, "food", false),
    ("t3", "2026-01-03", 25.0, "rent", false),
    ("t4", "2026-01-04", -75.0, "rent", true),
    ("t5", "2026-01-05", 10.0, "misc", false))
    .toDF("id", "date", "amount", "cat", "pending")
    .withColumn("date", $"date".cast("date"))

  test("P2: date filter requires both-or-neither bounds (lib:1547-1550)") {
    intercept[IllegalArgumentException] {
      TransactionOps.Filter(startDate = Some("2026-01-01"))
    }
  }

  test("P2: conjunctive optional predicates (lib:1510-1542)") {
    val f = TransactionOps.Filter(
      dateCol = "date",
      startDate = Some("2026-01-01"), endDate = Some("2026-01-04"),
      inSets = Map("cat" -> Seq("food", "rent")),
      boolEq = Map("pending" -> false))
    val got = f(df).select("id").as[String].collect().sorted.toSeq
    assert(got == Seq("t2", "t3"))
  }

  test("P2: absent predicates filter nothing") {
    assert(TransactionOps.Filter()(df).count() == 5)
  }

  test("P2: substring search across text columns (lib:1522)") {
    val f = TransactionOps.Filter(search = Some("REN"), searchCols = Seq("cat", "id"))
    assert(f(df).select("id").as[String].collect().sorted.toSeq == Seq("t3", "t4"))
  }

  test("O1+O4: ordered page with offset (lib:1446)") {
    val page = TransactionOps.page(df, Seq($"date".desc), limit = 2, offset = 1)
    assert(page.select("id").as[String].collect().toSeq == Seq("t4", "t3"))
  }

  test("A8: totalCount rides alongside the page (lib:1444-1446)") {
    val filtered = df.filter($"amount" > 0)
    val got = TransactionOps.withTotalCount(filtered, Seq($"date".asc), limit = 2)
    val rows = got.select("id", "total_count").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(1) == 3L))
  }

  test("A1: summary measures incl. maxExpense = most negative (lib:1367-1401)") {
    val s = TransactionOps.summary(df, $"amount", $"date").collect()(0)
    assert(s.getAs[Long]("count") == 5L)
    assert(s.getAs[Double]("max") == 100.0)
    assert(s.getAs[Double]("maxExpense") == -75.0)
    assert(s.getAs[Double]("sum") == 10.0)
    assert(s.getAs[Double]("sumIncome") == 135.0)
    assert(s.getAs[Double]("sumExpense") == -125.0)
    assert(s.getAs[java.sql.Date]("first").toString == "2026-01-01")
    assert(s.getAs[java.sql.Date]("last").toString == "2026-01-05")
  }

  test("O5: top-k keeps the k most recent (lib:840)") {
    val got = TransactionOps.topK(df, Seq($"date".desc), 2)
      .select("id").as[String].collect().toSeq
    assert(got == Seq("t5", "t4"))
  }

  test("P2: empty id-lists are no-ops, not match-nothing (lib:1515-1520 sends [])") {
    val all = df.count()
    val got = TransactionOps.Filter(inSets = Map("id" -> Seq.empty)).apply(df).count()
    assert(got == all)
  }

  test("P2: multi-word search never matches across a column boundary") {
    val rows = Seq(
      ("r1", "ACME STORE", "REFUND pending"), // 'store refund' spans the boundary
      ("r2", "corner store refund desk", "x") // genuine within-field match
    ).toDF("id", "plaidName", "notes")
    val got = TransactionOps.Filter(
        search = Some("store refund"), searchCols = Seq("plaidName", "notes"))
      .apply(rows).select("id").as[String].collect().toSeq
    assert(got == Seq("r2"))
  }

  test("A7: window groupCount and broadcast groupCountJoin agree, incl. NULL keys") {
    val rows = Seq(
      (1L, Some("m1")), (2L, Some("m1")), (3L, Some("m2")),
      (4L, None: Option[String]), (5L, None: Option[String]))
      .toDF("id", "merchant")
    val viaWindow = graft.operators.Windows
      .groupCount(rows, Seq(col("merchant")), "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    val viaJoin = graft.operators.Windows
      .groupCountJoin(rows, "merchant", "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(viaWindow == viaJoin)
    assert(viaJoin == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 2L),
      s"NULL-key rows must keep their group count: $viaJoin")
  }
}
