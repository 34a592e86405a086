package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Flatten

/** F7/F8/P4/F5 flatten semantics against hand-built nested rows, including
  * the null/missing-struct defaults the reference's `.get(k, "")` implies. */
class FlattenSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val nested = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("account", StructType(Seq(
        StructField("id", StringType),
        StructField("displayName", StringType),
        StructField("__typename", StringType)))),
      StructField("category", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("__typename", StringType)))),
      StructField("merchant", StructType(Seq(
        StructField("name", StringType),
        StructField("id", StringType),
        StructField("transactionsCount", LongType),
        StructField("__typename", StringType)))),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType)))))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("t1", Row("a9", "Checking", "Account"), Row("c1", "Groceries", "Category"),
          Row("Store", "m1", 42L, "Merchant"),
          Seq(Row("g1", "vacation"), Row("g2", "family"))),
        Row("t2", null, Row("c2", null, "Category"), null,
          Seq(Row("g3", ""), Row("g4", null), Row("g5", "solo"))),
        Row("t3", Row(null, null, null), null, Row(null, null, null, null), Seq()),
        Row("t4", null, null, null, null))),
      schema)
  }

  test("F7: struct breakouts with '' defaults for missing structs/fields (v3:440-481)") {
    val flat = Flatten.transaction(nested)
    val rows = flat.orderBy("id")
      .select("id", "AccID", "AccDispName", "AccType", "CatDispName",
        "MrchntDispName", "MrchntTranCount")
      .collect()
    assert(rows(0).toSeq == Seq("t1", "a9", "Checking", "Account", "Groceries", "Store", "42"))
    assert(rows(1).toSeq == Seq("t2", "", "", "", "", "", ""))
    assert(rows(2).toSeq == Seq("t3", "", "", "", "", "", ""))
    assert(rows(3).toSeq == Seq("t4", "", "", "", "", "", ""))
    assert(!flat.columns.contains("account") && !flat.columns.contains("category") &&
      !flat.columns.contains("merchant"))
  }

  test("F7: a batch MISSING a struct column still gets its breakouts with '' (v3:441-481)") {
    val noMerchant = Seq(("t1", 5.0)).toDF("id", "amount")
    val flat = Flatten.transaction(noMerchant)
    val expected = Seq("AccID", "AccDispName", "AccType", "CatID", "CatDispName",
      "CatType", "MrchntID", "MrchntDispName", "MrchntTranCount", "MrchntType", "TagsCSL")
    expected.foreach(c => assert(flat.columns.contains(c), s"missing breakout $c"))
    val row = flat.select(expected.map(col): _*).collect()(0)
    expected.indices.foreach(i => assert(row.getString(i) == "", s"${expected(i)} must default to ''"))
  }

  test("F8: account flatten tolerates missing type/subtype/institution structs") {
    val bare = Seq(("a1", "Checking")).toDF("id", "displayName")
    val flat = Flatten.account(bare)
    val row = flat.select("TypeDisplay", "AccountType", "InstitutionName").collect()(0)
    assert((0 to 2).forall(row.getString(_) == ""))
  }

  test("A4: TagsCSL joins non-empty names, keeps tags as JSON (v3:482-499)") {
    val flat = Flatten.transaction(nested)
    val rows = flat.orderBy("id").select("TagsCSL", "tags").collect()
    assert(rows(0).getString(0) == "vacation, family")
    assert(rows(1).getString(0) == "solo") // empty + null names filtered
    assert(rows(2).getString(0) == "")
    assert(rows(3).getString(0) == "")
    assert(rows(0).getString(1) == """[{"id":"g1","name":"vacation"},{"id":"g2","name":"family"}]""")
    assert(rows(2).getString(1) == "[]")
    assert(rows(3).getString(1) == null) // null array stays null; CSL is ""
  }

  test("F8: account flatten keeps originals and adds display columns (v3:995-1051)") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("type", StructType(Seq(
        StructField("name", StringType), StructField("display", StringType)))),
      StructField("subtype", StructType(Seq(
        StructField("name", StringType), StructField("display", StringType)))),
      StructField("institution", StructType(Seq(
        StructField("id", StringType), StructField("name", StringType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a1", Row("loan", "Loans"), Row("roth_ira", "Roth IRA"), Row("i1", "Bank")),
        Row("a2", null, Row("x", null), null))),
      schema)
    val flat = Flatten.account(df)
    val rows = flat.orderBy("id")
      .select("TypeDisplay", "AccountType", "InstitutionName").collect()
    assert(rows(0).toSeq == Seq("Loans", "Roth IRA", "Bank"))
    assert(rows(1).toSeq == Seq("", "", ""))
    assert(flat.columns.contains("type") && flat.columns.contains("subtype"))
  }

  test("P4: account-id resolution skips empty strings (v3:290-304)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("", "acc2", "fallback"),
        Row("acc1", "acc2", "fallback"),
        Row(null, "", "fallback"),
        Row(null, null, null))),
      StructType(Seq(
        StructField("accountId", StringType),
        StructField("account_id", StringType),
        StructField("nested_id", StringType))))
    val got = df.select(Flatten.resolveAccountId(
      col("accountId"), col("account_id"), col("nested_id")).as("r")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("acc2", "acc1", "fallback", null))
  }

  test("F5: sheetCells serializes remaining complex columns to JSON (v3:53-59)") {
    val df = nested.select(col("id"), col("account"), col("tags"))
    val cells = Flatten.sheetCells(df)
    assert(cells.schema.fields.forall(_.dataType == StringType))
    val r = cells.orderBy("id").collect()
    assert(r(0).getString(1) == """{"id":"a9","displayName":"Checking","__typename":"Account"}""")
  }
}
