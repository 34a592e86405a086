package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityScans

/** Entity-scan edge semantics: connection-shaped explodes, childless point
  * lookups, and null-flagged institution rows. */
class EntityScansSpec extends SparkTestBase {
  import spark.implicits._

  test("explodeEdges unwraps the GraphQL node wrapper when present") {
    val wrapped = spark.read.json(Seq(
      """{"accountId":"a1","edges":[{"node":{"quantity":3.0,"ticker":"XYZ"}},{"node":{"quantity":1.0,"ticker":"ABC"}}]}"""
    ).toDS())
    val got = EntityScans.explodeEdges(wrapped, "accountId", "edges")
    assert(got.columns.toSet == Set("accountId", "quantity", "ticker"))
    assert(got.count() == 2)
    // flat edge structs (no node wrapper) still work
    val flat = spark.read.json(Seq(
      """{"accountId":"a1","edges":[{"quantity":5.0,"ticker":"QQQ"}]}""").toDS())
    val gotFlat = EntityScans.explodeEdges(flat, "accountId", "edges")
    assert(gotFlat.columns.toSet == Set("accountId", "quantity", "ticker"))
    assert(gotFlat.select("quantity").as[Double].collect()(0) == 5.0)
  }

  test("point lookup of a childless parent returns the parent row, not empty") {
    val parents = Seq(("p1", 100.0), ("p2", 50.0)).toDF("pid", "amount")
    val children = Seq(("p1", 60.0), ("p1", 40.0)).toDF("cid", "split_amount")
    val withKids = EntityScans.pointLookupWithChildren(
      parents, children, "pid", "cid", "p1", col("split_amount"))
    assert(withKids.count() == 2)
    assert(withKids.select("split_sum").as[Double].collect().forall(_ == 100.0))
    val childless = EntityScans.pointLookupWithChildren(
      parents, children, "pid", "cid", "p2", col("split_amount"))
    assert(childless.count() == 1, "a childless parent is still a successful lookup")
    assert(childless.select("split_sum").collect()(0).isNullAt(0))
  }

  test("institutions keeps rows whose deleted flag is NULL (missing = falsy)") {
    val df = Seq(
      ("i1", Some(false)), ("i2", Some(true)), ("i3", None: Option[Boolean])
    ).toDF("id", "deleted")
    val kept = EntityScans.institutions(df, col("deleted"))
      .select("id").as[String].collect().toSet
    assert(kept == Set("i1", "i3"))
    val all = EntityScans.institutions(df, col("deleted"), includeDeleted = true).count()
    assert(all == 3)
  }
}
