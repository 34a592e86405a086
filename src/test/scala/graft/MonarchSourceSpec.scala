package graft

import org.apache.spark.sql.functions._

import graft.operators.{Contracts, Flatten}
import graft.sources.MonarchSource

/** S1/S2 entity readers over fixture-shaped JSON (the reference tests with
  * golden fixtures fed to a mocked transport, tests/test_monarchmoney.py:27-34
  * — here the fixture IS the source) plus F15 connection unwrap and the F11
  * date-key heuristic. */
class MonarchSourceSpec extends SparkTestBase {

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("transactions reader unwraps the connection and applies the schema (F15)") {
    val df = MonarchSource.transactions(spark, fixture("transactions_response.json"))
    assert(df.count() == 3)
    assert(df.select("total_count").distinct().collect()(0).getLong(0) == 3L)
    val r = df.filter(col("id") === "310000000000000001").collect()(0)
    assert(r.getAs[Double]("amount") == -42.75)
    assert(r.getAs[org.apache.spark.sql.Row]("category").getAs[String]("name") == "Coffee Shops")
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("tags")
      .map(_.getAs[String]("name")).toSeq == Seq("work", "coffee"))
    // 18-digit ids survive as strings (no numeric overflow)
    assert(df.schema("id").dataType == org.apache.spark.sql.types.StringType)
  }

  test("fixture transactions flow through flatten + contract end-to-end") {
    val df = MonarchSource.transactions(spark, fixture("transactions_response.json"))
      .drop("total_count")
    val flat = Contracts.transactions(
      Flatten.transaction(df).withColumn("loadedAtUtc", lit("2026-01-06 00:00:00")))
    assert(flat.columns.toSeq == Contracts.transactionHeaders(flat.columns.toSeq))
    val byId = flat.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("310000000000000001").getAs[String]("TagsCSL") == "work, coffee")
    assert(byId("310000000000000002").getAs[String]("TagsCSL") == "")
    assert(byId("310000000000000003").getAs[String]("AccDispName") == "") // null displayName -> ""
    assert(byId("310000000000000001").getAs[String]("MrchntTranCount") == "12")
    assert(byId("310000000000000001").getAs[String]("createdAt") == "2026-01-04 05:56:58")
  }

  test("accounts reader + F8 flatten + contract reproduces the reference's account table") {
    val df = MonarchSource.accounts(spark, fixture("accounts_response.json"))
    assert(df.count() == 3)
    val table = Contracts.accounts(Flatten.sheetCells(Flatten.account(df)))
    val rows = table.collect()
    assert(table.columns.take(7).toSeq == Contracts.accountPriority)
    // 3-key sort (TypeDisplay, AccountType, displayName)
    val keys = rows.map(r => (r.getAs[String]("TypeDisplay"), r.getAs[String]("AccountType"),
      r.getAs[String]("displayName"))).toSeq
    assert(keys == keys.sorted)
    val byId = rows.map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("900000002").getAs[String]("AccountType") == "Roth IRA")
    assert(byId("900000002").getAs[String]("InstitutionName") == "Example Brokerage")
    assert(byId("900000003").getAs[String]("AccountType") == "") // null subtype -> ""
    // type/subtype serialized as JSON cells, type column before subtype
    assert(table.columns.indexOf("subtype") == table.columns.indexOf("type") + 1)
  }

  test("F11: candidate-name probe then ISO-shaped value sniff (v3:189-201)") {
    import spark.implicits._
    val withCandidate = Seq(("1", "2026-01-01", "x")).toDF("id", "transDate", "other")
    assert(MonarchSource.findDateKey(withCandidate).contains("transDate"))
    val shapeOnly = Seq(("1", "2026-01-01"), ("2", "2025-12-31")).toDF("id", "when_posted")
    assert(MonarchSource.findDateKey(shapeOnly).contains("when_posted"))
    val noDate = Seq(("1", "hello")).toDF("id", "note")
    assert(MonarchSource.findDateKey(noDate).isEmpty)
    // candidate name wins over a differently-named ISO-shaped column
    val both = Seq(("2026-01-01", "2026-01-02")).toDF("activityDate", "otherDate")
    assert(MonarchSource.findDateKey(both).contains("activityDate"))
    // a candidate NAME with a non-date TYPE must not shadow a real date col
    val badType = Seq((1700000000000L, "2026-01-01")).toDF("createdAt", "posted_on")
    assert(MonarchSource.findDateKey(badType).contains("posted_on"))
  }

  test("A8 reconciliation: declared totalCount is readable when results is empty") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_resp")
    java.nio.file.Files.writeString(dir.resolve("resp.json"),
      """{"allTransactions": {"totalCount": 42, "results": []}}""")
    val path = dir.resolve("resp.json").toString
    assert(MonarchSource.transactions(spark, path).count() == 0)
    assert(MonarchSource.declaredTotalCount(spark, path).contains(42L),
      "the truncation signal must survive an empty results array")
  }
}
